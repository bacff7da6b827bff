package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sketch-based approximate statistics — the operators a 100 TB curation
  * pass reaches for when exact distinct counts or quantiles would force a
  * full shuffle of the key universe:
  *
  *   - approx distinct: HyperLogLog++ (`approx_count_distinct`) keeps a
  *     fixed ~kilobyte sketch per group and merges map-side, so the
  *     shuffle carries sketches, not keys. Relative standard deviation is
  *     the accuracy knob.
  *   - approx quantiles: Greenwald-Khanna (`percentile_approx`) with a
  *     bounded buffer per group, mergeable the same way. `accuracy`
  *     trades memory for rank error (err ≤ 1/accuracy · n).
  *
  * Both sketches are deterministic for a given dataset + parameters, so
  * results are stable across runs. Driver-gated rows-only (the DuckDB
  * twin computes different sketch internals, so there is no hash oracle);
  * the tolerance against exact answers — HLL within a multiple of rsd,
  * GK within the guaranteed rank error — is asserted in SketchSpec.
  */
object Sketches {

  /** Per-event-type approximate distinct users next to the exact row
    * count (the exact count is free — same shuffle). rsd=0.02 ⇒ the HLL
    * estimate is within ~2% of truth at one sigma. */
  def approxDistinct(df: DataFrame, keyCol: String, distinctCol: String,
                     rsd: Double = 0.02): DataFrame =
    df.groupBy(keyCol)
      .agg(
        approx_count_distinct(col(distinctCol), rsd).as("approx_distinct"),
        count(lit(1)).as("n_rows"))

  /** Per-group approximate quantiles of a value column. */
  def approxQuantiles(df: DataFrame, keyCol: String, valCol: String,
                      qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
                      accuracy: Int = 10000): DataFrame =
    df.groupBy(keyCol)
      .agg(percentile_approx(col(valCol),
        array(qs.map(lit): _*), lit(accuracy)).as("quantiles"))

  /** [[approxQuantiles]] exploded to one scalar row per (group, q) — the
    * driver-gated shape (its result compare handles scalar columns, not
    * arrays), and the friendlier downstream shape anyway. */
  def approxQuantilesLong(df: DataFrame, keyCol: String, valCol: String,
                          qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
                          accuracy: Int = 10000): DataFrame =
    approxQuantiles(df, keyCol, valCol, qs, accuracy)
      .select(col(keyCol), posexplode(col("quantiles")).as(Seq("__pos", "quantile_value")))
      .withColumn("q", element_at(array(qs.map(lit): _*), col("__pos") + 1))
      .select(col(keyCol), col("q"), col("quantile_value"))

  // ---- query-map entries (rows-gated; tolerance vs exact in SketchSpec) ----

  def sketchDistinctEvents(spark: SparkSession, dir: String): DataFrame =
    approxDistinct(Tables.events(spark, dir), "event_type", "user_id")

  def sketchQuantilesLineitem(spark: SparkSession, dir: String): DataFrame =
    approxQuantilesLong(Tables.lineitem(spark, dir), "l_returnflag", "l_extendedprice")

  /** Degeneracy gate (the ann_*_exhaustive trick): GK with accuracy ≥ n
    * retains every observation, so the "approximate" path returns the
    * EXACT discrete quantile element — and can share an exact DuckDB
    * oracle, hash-gating the whole sketch machinery (buffer, merge,
    * rank query) rather than rows-only. */
  def sketchQuantilesExact(spark: SparkSession, dir: String): DataFrame =
    approxQuantilesLong(Tables.lineitem(spark, dir), "l_returnflag",
      "l_quantity", qs = Seq(0.25, 0.5, 0.75, 0.99), accuracy = 10000000)

  def quantilesExactOracleSql: String =
    Seq(0.25, 0.5, 0.75, 0.99).map { q =>
      s"""SELECT l_returnflag, CAST($q AS DOUBLE) AS q,
         |  quantile_disc(l_quantity, $q) AS quantile_value
         |FROM lineitem GROUP BY l_returnflag""".stripMargin
    }.mkString("\nUNION ALL\n")
}
