package graft

import graft.queries.TpchMore
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second-wave relational queries: each checked against an independent
  * naive Spark formulation (the DuckDB hash gate runs driver-side; these
  * keep the semantics pinned in-repo too). */
class TpchMoreSpec extends SparkSpec {

  test("q4: semi-join count equals distinct-key count of matching pairs") {
    val got = TpchMore.q4OrderPriority(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val naive = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select("o_orderkey", "o_orderpriority").distinct()
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == naive && got.nonEmpty)
  }

  test("q7: only directed pairs within the nation set, years 1995-1996") {
    val rows = TpchMore.q7VolumeShipping(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nations = (1 to 4).map(i => s"NATION_$i").toSet
    rows.foreach { r =>
      assert(nations(r.getString(0)) && nations(r.getString(1)))
      assert(r.getString(0) != r.getString(1))
      assert(Set(1995, 1996)(r.getInt(2)))
      assert(r.getDouble(3) > 0)
    }
  }

  test("q9: profit grouped by nation/year over ECONOMY parts only") {
    val rows = TpchMore.q9ProductProfit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getInt(1)))
    assert(keys.distinct.length == keys.length)
  }

  test("q14: promo share is a percentage in [0, 100]") {
    val v = TpchMore.q14PromoRevenue(spark, sfDir).head().getDouble(0)
    assert(v >= 0.0 && v <= 100.0)
  }

  test("q17: pre-agg join-back equals the window formulation") {
    val got = TpchMore.q17SmallQtyRevenue(spark, sfDir).head()
    val li = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_brand") === "Brand#23"),
        col("l_partkey") === col("p_partkey"))
    val w = Window.partitionBy("l_partkey")
    val naive = li
      .withColumn("qty_limit", lit(0.2) * avg("l_quantity").over(w))
      .filter(col("l_quantity") < col("qty_limit"))
      .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
      .head()
    assert(!got.isNullAt(0) && got.getDouble(0) == naive.getDouble(0))
  }

  test("q18: every surviving order exceeds the quantity threshold") {
    val rows = TpchMore.q18LargeOrders(spark, sfDir, minQty = 150.0).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(r.fieldIndex("total_qty")) > 150.0))
    // one row per qualifying order
    val keys = rows.map(_.getLong(2))   // o_orderkey
    assert(keys.distinct.length == keys.length)
  }

  test("q22: anti-join equals naive except-based dormant set") {
    val cust = Tables.customer(spark, sfDir)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg("c_acctbal")).head().getDouble(0)
    val recent = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("2001-01-01"))
      .select("o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val naive = cust.collect()
      .filter(r => r.getDouble(r.fieldIndex("c_acctbal")) > avgBal &&
        !recent(r.getLong(r.fieldIndex("c_custkey"))))
      .groupBy(r => r.getInt(r.fieldIndex("c_nationkey")))
      .view.mapValues(_.length).toMap
    val got = TpchMore.q22DormantCustomers(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1).toInt)).toMap
    assert(got == naive && got.nonEmpty)
  }

  test("q13: outer join preserves every customer (zero-order bucket included)") {
    val got = TpchMore.q13OrderDistribution(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // independent formulation: pre-agg the filtered orders, LEFT join back,
    // coalesce the miss to zero
    val ordCounts = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val naive = Tables.customer(spark, sfDir).select("c_custkey")
      .join(ordCounts, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("n"), lit(0L)).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == naive && got.nonEmpty)
    // the outer-join property: the distribution accounts for ALL customers
    assert(got.values.sum == Tables.customer(spark, sfDir).count())
  }

  test("q21: sole-returner equals naive per-order cardinality formulation") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_returnflag")
    val perOrder = li.groupBy("l_orderkey").agg(
      countDistinct("l_suppkey").as("nsupp"),
      countDistinct(when(col("l_returnflag") === "R", col("l_suppkey"))).as("nret"))
    val fin = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F").select("o_orderkey")
    val naive = li.filter(col("l_returnflag") === "R")
      .join(fin, col("l_orderkey") === col("o_orderkey"))
      .join(perOrder, Seq("l_orderkey"))
      .filter(col("nsupp") > 1 && col("nret") === 1)
      .join(Tables.supplier(spark, sfDir).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = TpchMore.q21WaitingSupplier(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == naive && got.nonEmpty)
  }
}
