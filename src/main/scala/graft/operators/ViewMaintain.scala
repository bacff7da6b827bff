package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Incremental MATERIALIZED-VIEW maintenance driven by the versioned
  * table's change feed — the missing half of the lakehouse loop:
  * [[graft.streaming.VersionedTableSink]] lands batches as commits,
  * [[VersionedTable.changesBetween]] exposes each transition as
  * insert/delete row images, and this operator folds those images into
  * a kept-current aggregate without ever rescanning the fact. Where
  * [[IncrementalAgg]] maintains a view under APPEND-ONLY batches, this
  * handles the full DML surface — upserts and overwrites arrive as
  * delete(pre-image) + insert(post-image) pairs, so any commit kind
  * maintains correctly through one signed merge. The reference rebuilds
  * its gold aggregates per run against Delta tables
  * (/root/reference/DataEngineering/DataBricks/
  * AIO_delta_table_generator.py, merge_generator.py); Delta users get
  * this loop from CDF + MERGE — here it is the portable layer's own.
  *
  * Algebra: views are COMMUTATIVE-GROUP aggregates (count, sum — i.e.
  * monoids with subtraction), stored as partials; a change batch folds
  * in as state ⊕ agg(inserts) ⊖ agg(deletes), then groups whose row
  * count nets to zero are dropped (an exact feed nets their sums to
  * zero too). avg/ratios derive from partials at read time.
  *
  * Scale stance: each maintenance step aggregates ONLY the change feed
  * (map-side combine) and merges on the view key — cost is
  * O(changes + touched groups), independent of fact history. An
  * overwrite of a 100 TB table is the worst case (feed ≈ old + new),
  * which is exactly the recompute cost — maintenance never does worse
  * than the rebuild it replaces.
  */
object ViewMaintain {

  /** Fold one change feed (rows tagged `_change_type` insert/delete)
    * into `state` (keyed by `keys`, partials `cnt` + `sum_<c>`). */
  def applyChanges(state: DataFrame, changes: DataFrame, keys: Seq[String],
                   valueCols: Seq[String]): DataFrame = {
    val sign = when(col("_change_type") === "insert", lit(1L))
      .otherwise(lit(-1L))
    val delta = changes.withColumn("__s", sign)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__s")).as("cnt"),
        valueCols.map(c => sum(col(c) * col("__s")).as(s"sum_$c")): _*)
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum("cnt").as("cnt"),
        valueCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
      .filter(col("cnt") =!= 0)
  }

  /** Initial state: the view aggregated directly over one snapshot. */
  def initialState(snapshot: DataFrame, keys: Seq[String],
                   valueCols: Seq[String]): DataFrame =
    snapshot.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        valueCols.map(c => sum(col(c)).as(s"sum_$c")): _*)

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: an order-year revenue view maintained across the
    * canonical 4-version table (two appends, an upsert, an overwrite).
    * State₀ aggregates version 0 directly; each later state folds in
    * ONLY `changesBetween(v-1, v)`. All four maintained states are
    * emitted, and the oracle recomputes each from the era definition —
    * so the gate breaks if any commit kind (append, update-as-
    * delete+insert, overwrite retirement) maintains incorrectly,
    * including the overwrite's total eviction of pre-1998 groups. */
  def ivmOrdersByYear(spark: SparkSession, dir: String): DataFrame = {
    val table = VersionedTable.buildOrdersTable(spark, dir, "ivm")
    val keys = Seq("yr")
    val vals = Seq("cents")
    def byYear(df: DataFrame): DataFrame =
      df.withColumn("yr", year(col("d")).cast("int"))
    val s0 = initialState(byYear(
      VersionedTable.readVersion(spark, table, 0L)), keys, vals)
      .localCheckpoint()
    val states = Seq.iterate((0L, s0), 4) { case (v, st) =>
      val feed = byYear(VersionedTable.changesBetween(spark, table, v, v + 1))
      (v + 1, applyChanges(st, feed, keys, vals).localCheckpoint())
    }
    states.map { case (v, st) =>
      st.select(lit(v).cast("long").as("version"), col("yr"),
        col("cnt"), col("sum_cents"))
    }.reduce(_ unionByName _)
  }

  def oracleSql: String =
    """WITH o AS (
      |  SELECT o_orderkey AS k,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    CAST(year(o_orderdate) AS INT) AS yr,
      |    o_orderdate AS d
      |  FROM orders
      |), s0 AS (
      |  SELECT * FROM o WHERE d < DATE '1995-01-01'
      |), s1 AS (
      |  SELECT * FROM o WHERE d < DATE '1997-01-01'
      |), s2 AS (
      |  SELECT CASE WHEN k % 97 = 0 THEN 2 * cents ELSE cents END AS cents,
      |    yr
      |  FROM o WHERE d < DATE '1997-01-01'
      |  UNION ALL
      |  SELECT cents, yr FROM o WHERE d >= DATE '1997-01-01'
      |), s3 AS (
      |  SELECT * FROM o WHERE d >= DATE '1998-01-01'
      |)
      |SELECT CAST(0 AS BIGINT) AS version, yr,
      |  CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM s0 GROUP BY yr
      |UNION ALL
      |SELECT CAST(1 AS BIGINT), yr, CAST(count(*) AS BIGINT),
      |  CAST(sum(cents) AS BIGINT)
      |FROM s1 GROUP BY yr
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), yr, CAST(count(*) AS BIGINT),
      |  CAST(sum(cents) AS BIGINT)
      |FROM s2 GROUP BY yr
      |UNION ALL
      |SELECT CAST(3 AS BIGINT), yr, CAST(count(*) AS BIGINT),
      |  CAST(sum(cents) AS BIGINT)
      |FROM s3 GROUP BY yr""".stripMargin
}
