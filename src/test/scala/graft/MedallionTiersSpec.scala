package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{FeatureAssembly, Medallion}

/** Silver/gold medallion tiers + feature assembly. */
class MedallionTiersSpec extends SparkSpec {
  import spark.implicits._

  test("silver surrogate keys are dense 1..N in natural-key order and partitioning-invariant") {
    val silver = Medallion.medallionSilverOrders(spark, sfDir)
    val got = silver.select("oOrderkey", "orderSk")
      .as[(Long, Long)].collect().sortBy(_._1)
    val n = got.length
    assert(n > 0)
    // dense 1..N, ordered exactly like the natural key
    assert(got.map(_._2).toList == (1L to n).toList)
    // replay determinism (the Delta IDENTITY analogue must not depend on
    // physical layout): same keys from a different partitioning
    val again = Medallion.silverApply(
        Medallion.medallionBronzeOrders(spark, sfDir).repartition(7),
        Seq("oOrderkey"), "orderSk",
        floor(col("oOrderkey") / 1000).cast("long"))
      .select("oOrderkey", "orderSk").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toList == again.toList)
  }

  test("silver keeps only the latest envelope row per natural key") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType),
      StructField("currentVersion", IntegerType),
      StructField("effectiveDate", IntegerType),
      StructField("expirationDate", IntegerType)))
    val rows = Seq(
      Row(1L, "old", 1, 20230101, 20240101),
      Row(1L, "new", 1, 20240102, Medallion.FarFuture),
      Row(2L, "only", 1, 20240101, Medallion.FarFuture))
    val bronze = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val silver = Medallion.silverApply(bronze, Seq("k"), "sk", col("k"))
    val got = silver.select("k", "v", "sk").as[(Long, String, Long)]
      .collect().sortBy(_._1).toList
    assert(got == List((1L, "new", 1L), (2L, "only", 2L)), s"got $got")
  }

  test("gold is the current-rows projection without lineage") {
    val gold = Medallion.medallionGoldOrders(spark, sfDir)
    assert(!gold.columns.contains("sourceFile"))
    assert(gold.columns.contains("orderSk"))
    val silverCnt = Medallion.medallionSilverOrders(spark, sfDir).count()
    assert(gold.count() == silverCnt) // test bronze is all current-version
  }

  test("label index follows StringIndexer frequencyDesc semantics (ties by value)") {
    val df = Seq("b", "b", "a", "a", "c").toDF("label")
    val idx = FeatureAssembly.labelIndex(df, "label")
      .select("label", "label_idx").as[(String, Long)].collect().toMap
    // a and b tie at 2 -> value order; c is rarest
    assert(idx == Map("a" -> 0L, "b" -> 1L, "c" -> 2L), s"got $idx")
  }

  test("class weights are balanced: total / (k * count)") {
    val df = Seq("x", "x", "x", "y").toDF("label")
    val w = FeatureAssembly.labelIndex(df, "label")
      .select("label", "weight").as[(String, Double)].collect().toMap
    // weight column is rounded to 6dp for cross-engine hash stability
    assert(math.abs(w("x") - 4.0 / (2 * 3)) < 1e-6)
    assert(math.abs(w("y") - 4.0 / (2 * 1)) < 1e-6)
  }

  test("assemble builds the feature array in declared column order") {
    val df = Seq((1L, 2.5, 7)).toDF("id", "a", "b")
    val out = FeatureAssembly.assemble(df, Seq("b", "a"), "features")
      .select("features").as[Seq[Double]].head()
    assert(out == Seq(7.0, 2.5))
  }
}
