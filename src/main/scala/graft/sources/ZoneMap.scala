package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Zone-map (min/max statistics) pruning audit — the data-skipping
  * layer that makes [[PartitionedLayout]] / [[graft.operators.Zorder]]
  * layouts pay off at 100 TB: per storage zone, the column min/max a
  * file footer would carry, the scan/skip decision for a range
  * predicate, and the proof obligation that skipped zones contain ZERO
  * matching rows (a zone map that lies is corruption, not an
  * optimization — the reference's lake layouts rely on exactly this
  * parquet row-group statistic, DataEngineering/DataBricks/
  * spark_stream.py's bronze→silver file flow).
  *
  * One aggregate to zone cardinality builds the map; the decision is
  * interval overlap on the zone table; the verification join counts
  * matches per zone so `matched > 0 ⇒ scanned` is CHECKABLE in the
  * output (and spec-asserted). Scale: everything after the scan runs
  * at zone cardinality.
  */
object ZoneMap {

  /** Per-zone rows (zone, n_rows, zmin, zmax, scanned, n_matched) +
    * global (zones_total, zones_scanned, rows_total, rows_scanned,
    * rows_matched) repeated — for a [lo, hi] range predicate on
    * `valueCol` over zones given by `zoneCol`. */
  def pruneAudit(df: DataFrame, zoneCol: Column, valueCol: Column,
                 lo: Long, hi: Long): DataFrame = {
    val zones = df.select(zoneCol.as("zone"), valueCol.as("v"))
      .groupBy(col("zone"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("v")).as("zmin"), max(col("v")).as("zmax"),
        sum(when(col("v").between(lo, hi), 1L).otherwise(0L)).as("n_matched"))
      .withColumn("scanned", col("zmin") <= hi && col("zmax") >= lo)
      .localCheckpoint() // consumed by output AND the summary aggregate
    val summary = zones.agg(
      count(lit(1)).as("zones_total"),
      sum(when(col("scanned"), 1L).otherwise(0L)).as("zones_scanned"),
      sum(col("n_rows")).as("rows_total"),
      coalesce(sum(when(col("scanned"), col("n_rows"))), lit(0L))
        .as("rows_scanned"),
      sum(col("n_matched")).as("rows_matched"))
    zones.crossJoin(broadcast(summary))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: lineitem laid out in shipdate-month zones (the
    * clustered layout Compaction/Zorder produce), pruned for a
    * half-year epoch-day range — boundary months survive with partial
    * matches, out-of-range months are provably skippable. */
  def zonemapLineitem(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.lineitem(spark, dir)
      .select((year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .cast("long").as("zone"),
        datediff(col("l_shipdate").cast("date"), lit("1990-01-01").cast("date"))
          .cast("long").as("v"))
    // [1997-03-15, 1997-09-15] as days since 1990-01-01
    pruneAudit(d, col("zone"), col("v"), lo = 2630L, hi = 2814L)
  }

  def oracleSql: String =
    """WITH zones AS (
      |  SELECT (year(l_shipdate) * 12 + month(l_shipdate)) AS zone,
      |    CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(min(date_diff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)))
      |      AS BIGINT) AS zmin,
      |    CAST(max(date_diff('day', DATE '1990-01-01', CAST(l_shipdate AS DATE)))
      |      AS BIGINT) AS zmax,
      |    CAST(sum(CASE WHEN date_diff('day', DATE '1990-01-01',
      |        CAST(l_shipdate AS DATE)) BETWEEN 2630 AND 2814
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
      |  FROM lineitem GROUP BY 1
      |), flagged AS (
      |  SELECT CAST(zone AS BIGINT) AS zone, n_rows, zmin, zmax, n_matched,
      |    zmin <= 2814 AND zmax >= 2630 AS scanned
      |  FROM zones
      |), summary AS (
      |  SELECT CAST(count(*) AS BIGINT) AS zones_total,
      |    CAST(sum(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT) AS zones_scanned,
      |    CAST(sum(n_rows) AS BIGINT) AS rows_total,
      |    CAST(coalesce(sum(CASE WHEN scanned THEN n_rows END), 0) AS BIGINT)
      |      AS rows_scanned,
      |    CAST(sum(n_matched) AS BIGINT) AS rows_matched
      |  FROM flagged
      |)
      |SELECT f.zone, f.n_rows, f.zmin, f.zmax, f.scanned, f.n_matched,
      |  s.zones_total, s.zones_scanned, s.rows_total, s.rows_scanned,
      |  s.rows_matched
      |FROM flagged f CROSS JOIN summary s""".stripMargin
}
