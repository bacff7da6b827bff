package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational/analytic queries over the TPC-H-ish test tables.
  *
  * These exercise the engine surface the reference's ETL relies on everywhere
  * (groupBy aggregation, star joins, windows, JSON extraction, skew-safe
  * top-k) — see e.g. /root/reference/DataEngineering/DataBricks/
  * merge_generator.py (joins), apply_scd2.py (windows),
  * AIO_delta_table_generator.py (JSON ingestion, star schema).
  *
  * Scale stance: dims are broadcast; fact-side aggregates are partial
  * (map-side combine comes free from groupBy on declarative aggs);
  * double-valued aggregates are rounded at the end so results are
  * hash-stable across partial-agg orderings.
  */
object TpchLike {

  /** Q1-style pricing summary: single-pass multi-aggregate with a pushed
    * filter. At 100 TB this is a pure scan+partial-agg — no shuffle beyond
    * the tiny final combine (cardinality = |returnflag|×|linestatus|). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  def q1OracleSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Q3-style shipping priority: orders⋈lineitem with selective filters on
    * both sides (pushed to the scans), grouped revenue, top 10.
    * customer scales linearly with the data, so it gets no broadcast hint —
    * AQE broadcasts it while it fits and shuffle-joins beyond that;
    * orders⋈lineitem shuffles on orderkey — at scale both facts would be
    * bucketed on orderkey to kill the shuffle. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1995-03-15"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1995-03-15"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  def q3OracleSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Q5-style local-supplier volume: 6-way star join. Genuinely bounded
    * dims (region/nation/supplier) broadcast; customer scales with the
    * data (fact-sized at 100 TB) so it joins without a hint — AQE
    * broadcasts it while small and shuffle-joins on o_custkey beyond
    * that. Only lineitem⋈orders and orders⋈customer can ever shuffle. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
              col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")

    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc)
  }

  def q5OracleSql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC""".stripMargin

  /** Top-3 customers by spend within each market segment — the window-rank
    * shape the reference uses in apply_scd2.py. One shuffle on the window
    * partition key; rank prunes before any further join. */
  def topCustomersWindow(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("total_spend"))
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name", "c_mktsegment")
    val w = Window.partitionBy("c_mktsegment").orderBy(col("total_spend").desc, col("c_custkey"))
    cust.join(spend, col("c_custkey") === col("o_custkey"))
      .withColumn("seg_rank", row_number().over(w))
      .filter(col("seg_rank") <= 3)
      .select("c_mktsegment", "seg_rank", "c_custkey", "c_name", "total_spend")
  }

  def topCustomersOracleSql: String =
    """SELECT c_mktsegment, seg_rank, c_custkey, c_name, total_spend FROM (
      |  SELECT c.c_mktsegment, c.c_custkey, c.c_name, s.total_spend,
      |    row_number() OVER (PARTITION BY c.c_mktsegment
      |                       ORDER BY s.total_spend DESC, c.c_custkey) AS seg_rank
      |  FROM customer c
      |  JOIN (SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend
      |        FROM orders GROUP BY o_custkey) s
      |    ON c.c_custkey = s.o_custkey
      |) WHERE seg_rank <= 3""".stripMargin

  /** JSON property extraction from the events.props string column —
    * the is_JSON ingestion path of AIO_delta_table_generator.py re-expressed
    * as a codegen'd expression (get_json_object), no UDF. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("prop_k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum("prop_k").as("sum_k"),
        round(avg("prop_k"), 4).as("avg_k"))
  }

  def jsonExtractOracleSql: String =
    """SELECT event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
      |FROM events
      |GROUP BY event_type""".stripMargin

  /** Skew-safe top-k: two-phase aggregation — salted partial counts, then
    * final combine — the salting discipline of salt_cumsum.py applied to a
    * hot-key count. Result is identical to a plain groupBy count; the shape
    * guarantees no single reducer sees a whole hot key at 100 TB. */
  def skewTopk(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val salted = Tables.events(spark, dir)
      .select(col("user_id"), (col("event_id") % 16).as("salt"), col("value"))
      .groupBy("user_id", "salt")
      .agg(count(lit(1)).as("pc"), sum("value").as("pv"))
    salted
      .groupBy("user_id")
      .agg(sum("pc").as("n_events"), round(sum("pv"), 2).as("total_value"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(k)
  }

  def skewTopkOracleSql: String =
    """SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY user_id
      |ORDER BY n_events DESC, user_id
      |LIMIT 10""".stripMargin
}
