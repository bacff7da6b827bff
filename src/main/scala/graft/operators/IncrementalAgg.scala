package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental aggregate maintenance — the materialized-view pattern
  * behind every incremental load in the reference's medallion flow
  * (/root/reference/DataEngineering/DataBricks/AIO_delta_table_generator.py
  * rebuilds gold aggregates per run; at 100 TB you maintain them:
  * gold_new = merge(gold_old, agg(batch)) instead of re-scanning the
  * fact). Works for any COMMUTATIVE-MONOID aggregate (count, sum —
  * stored as partials; avg is derived sum/count at read time).
  *
  * Scale stance: each maintenance step aggregates ONLY the batch
  * (map-side combine), then one key-partitioned merge with the state —
  * cost is O(batch + touched keys), independent of total fact history.
  * The state table never stores derived ratios, only mergeable partials,
  * so steps compose associatively: any batch arrival order that covers
  * the same rows yields the identical state.
  */
object IncrementalAgg {

  /** One maintenance step: fold `batch` into `state` (both keyed by
    * `keys` with partial columns `cnt` + `sum_<c>` per value column). */
  def maintain(state: DataFrame, batch: DataFrame, keys: Seq[String],
               valueCols: Seq[String]): DataFrame = {
    val partial = batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        valueCols.map(c => sum(col(c)).as(s"sum_$c")): _*)
    state.unionByName(partial)
      .groupBy(keys.map(col): _*)
      .agg(sum("cnt").as("cnt"),
        valueCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
  }

  /** Empty state with the schema [[maintain]] expects. */
  def emptyState(spark: SparkSession, like: DataFrame, keys: Seq[String],
                 valueCols: Seq[String]): DataFrame =
    like.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        valueCols.map(c => sum(col(c)).as(s"sum_$c")): _*)
      .limit(0)

  // ---- query-map entry (hash-gated) ----

  /** Orders folded in as three deterministic batches (o_orderkey mod 3);
    * the maintained state must equal the direct full aggregation — the
    * oracle IS that direct GROUP BY, so incremental == batch semantics
    * sits inside the hash gate. Value sums are exact integer cents. */
  def incrementalAggOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val keys = Seq("o_orderstatus", "o_orderpriority")
    val batches = (0 to 2).map(i => orders.filter(col("o_orderkey") % 3 === i))
    val state0 = emptyState(spark, orders, keys, Seq("cents"))
    val finalState = batches.foldLeft(state0)(
      (s, b) => maintain(s, b, keys, Seq("cents")))
    finalState.select(col("o_orderstatus"), col("o_orderpriority"),
      col("cnt"), col("sum_cents"))
  }

  def oracleSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
      |    AS sum_cents
      |FROM orders
      |GROUP BY o_orderstatus, o_orderpriority""".stripMargin
}
