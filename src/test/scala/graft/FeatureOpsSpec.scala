package graft

import graft.operators.{FeatureEncoders, Scaling, SchemaTools}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class FeatureOpsSpec extends SparkSpec {

  test("count encode: counts sum to table size") {
    val ce = FeatureEncoders.countEncodeOrders(spark, sfDir)
    val total = ce.agg(sum("o_orderpriority_ce")).collect()(0).getLong(0)
    assert(total == Tables.orders(spark, sfDir).count())
  }

  test("target encode: smoothed means lie between global min and max") {
    val te = FeatureEncoders.targetEncodeCustomer(spark, sfDir).collect()
    val Array(mn, mx) = Tables.customer(spark, sfDir)
      .agg(min("c_acctbal"), max("c_acctbal")).collect()(0)
      .toSeq.map(_.asInstanceOf[Double]).toArray
    te.foreach { r =>
      val v = r.getDouble(r.fieldIndex("c_mktsegment_te"))
      assert(v >= mn && v <= mx)
    }
  }

  test("one-hot: exactly one hot column per row") {
    val oh = FeatureEncoders.oneHotCustomer(spark, sfDir)
    val hotCols = oh.columns.filter(_.startsWith("seg_"))
    assert(hotCols.length == 5)
    val rowSum = hotCols.map(col).reduce(_ + _)
    assert(oh.filter(rowSum =!= 1).count() == 0)
  }

  test("standard scaling: mean ~0, stddev ~1") {
    val sc = Scaling.standardCustomer(spark, sfDir)
    val r = sc.agg(avg("c_acctbal_z"), stddev_samp("c_acctbal_z")).collect()(0)
    assert(math.abs(r.getDouble(0)) < 0.01)
    assert(math.abs(r.getDouble(1) - 1.0) < 0.01)
  }

  test("minmax scaling: bounds are 0 and 1") {
    val mm = Scaling.minMaxCustomer(spark, sfDir)
    val r = mm.agg(min("c_acctbal_mm"), max("c_acctbal_mm")).collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 1.0)
  }

  test("shrink: narrows lineitem int columns and adds attnmasks") {
    val shrunk = SchemaTools.shrink(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_linenumber"))
    val types = shrunk.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("l_linenumber") == ByteType)
    assert(types.contains("l_orderkey_attnmask"))
    assert(types("l_orderkey_attnmask") == ByteType)
    // values preserved through the cast
    assert(shrunk.agg(sum(col("l_linenumber").cast("long"))).collect()(0).getLong(0) ==
      Tables.lineitem(spark, sfDir).agg(sum("l_linenumber")).collect()(0).getLong(0))
  }

  test("classify: status/priority categorical, keys other") {
    val m = SchemaTools.classifyOrders(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getString(r.fieldIndex("col_class"))).toMap
    assert(m("o_orderstatus") == "categorical")
    assert(m("o_orderpriority") == "categorical")
    assert(m("o_orderkey") == "other")
  }

  test("class weights: weighted total count is balanced") {
    val cw = SchemaTools.classWeightsOrders(spark, sfDir).collect()
    val k = cw.length
    val total = cw.map(_.getLong(1)).sum
    cw.foreach { r =>
      val expected = total.toDouble / (k * r.getLong(1))
      assert(math.abs(r.getDouble(2) - expected) < 1e-4)
    }
  }

  test("winsorize clamps into discrete-quantile bounds") {
    import org.apache.spark.sql.functions.col
    // values 1..21: n=21, lo rank floor(.05*20)+1=2 -> 2.0,
    // hi rank floor(.95*20)+1=20 -> 20.0
    val df = spark.createDataFrame(
      (1 to 21).map(i => (i.toLong, i.toDouble))).toDF("id", "v")
    val w = graft.operators.Scaling.winsorize(df, Seq("v"))
      .collect().map(r => r.getAs[Double]("v") -> r.getAs[Double]("v_w")).toMap
    assert(w(1.0) == 2.0 && w(21.0) == 20.0, "tails clamped to rank bounds")
    assert(w(2.0) == 2.0 && w(20.0) == 20.0 && w(11.0) == 11.0)
  }

  test("robust scale centers on median, spreads by IQR") {
    // values 1..21: q1 rank floor(.25*20)+1=6 -> 6, med rank 11 -> 11,
    // q3 rank 16 -> 16; IQR=10
    val df = spark.createDataFrame(
      (1 to 21).map(i => (i.toLong, i.toDouble))).toDF("id", "v")
    val r = graft.operators.Scaling.robustScale(df, Seq("v"))
      .collect().map(x => x.getAs[Double]("v") -> x.getAs[Double]("v_r")).toMap
    assert(r(11.0) == 0.0 && r(21.0) == 1.0 && r(1.0) == -1.0)
    assert(r(16.0) == 0.5 && r(6.0) == -0.5)
  }
}
