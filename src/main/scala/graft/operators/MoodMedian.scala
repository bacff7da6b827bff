package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Mood's median test — the k-group nonparametric "do these groups
  * share a center?" screen: split every observation at the GRAND
  * median and chi-square the resulting 2×k table. Robust to any
  * monotone transform of the metric, which is why it survives heavy
  * tails that break [[WelchT]]; it complements [[KruskalWallis]]
  * (which tests mean ranks) with a pure location test that is exact
  * under ties. Same experiment-readout family as [[Contingency]].
  *
  * Exactness: the grand median is the exact LOWER median from
  * value-cell cumulation ([[WeightedMedian]]'s `2·cum ≥ N` walk — no
  * division, no float). The 2×k counts are BIGINT cell sums, and each
  * chi-square contribution is the [[Contingency]] discipline: a FIXED
  * scalar double expression over exact integers (`e = rt·ct/N`,
  * `(n−e)²/e`), evaluated once per output row in the same IEEE order
  * in both engines, rounded to integer micros. No float aggregates,
  * so partial-agg ordering cannot flap the hash.
  *
  * Scale: ONE fact pass to (group, value) cells; the grand-median
  * walk and the side counts are both re-aggregations of that
  * domain-bounded cell table (score cents ≤ ~10⁵ distinct values).
  * The 2×k margins are broadcasts. Fact data is never touched twice.
  */
object MoodMedian {

  /** Per (grp, side) rows — side ∈ {'le_median','gt_median'} — with
    * (grand_median, n, exp_micros, chi2_micros). Sum `chi2_micros`
    * for the statistic (df = k−1). */
  def moodMedian(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val cells = df
      .groupBy(col(groupCol).as("g"), col(valueCol).as("v"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"))
      .localCheckpoint() // consumed by the median walk AND the sides
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    // grand lower median over the GLOBAL value-cell table (cells
    // re-aggregated across groups first so the window walks ≤ |domain|
    // rows, not |domain|·k)
    val median = cells.groupBy("v").agg(sum("n").as("nv"))
      .withColumn("cum", sum("nv").over(wCum))
      .withColumn("tot", sum("nv").over(wAll))
      .filter(expr("2 * cum >= tot") && expr("2 * (cum - nv) < tot"))
      .select(col("v").as("grand_median"))
    // the broadcast single-row cross is scalar attachment (the filter
    // over the cumulative walk yields exactly one row by the crossing
    // test's construction); sides is k rows — checkpoint it so the six
    // downstream consumers (two union branches × three margin
    // aggregates) read k rows instead of replaying the cell pipeline
    val sides = cells.crossJoin(broadcast(median))
      .groupBy(col("g"), col("grand_median"))
      .agg(
        sum(when(col("v") <= col("grand_median"), col("n")).otherwise(lit(0)))
          .cast("long").as("n_le"),
        sum(when(col("v") > col("grand_median"), col("n")).otherwise(lit(0)))
          .cast("long").as("n_gt"))
      .localCheckpoint()
    val long2x = sides.select(col("g"), col("grand_median"),
        lit("le_median").as("side"), col("n_le").as("n"))
      .unionByName(sides.select(col("g"), col("grand_median"),
        lit("gt_median").as("side"), col("n_gt").as("n")))
    val rowTot = long2x.groupBy("g").agg(sum("n").as("__rt"))
    val colTot = long2x.groupBy("side").agg(sum("n").as("__ct"))
    val total = long2x.agg(sum("n").as("__N"))
    val e = col("__rt").cast("double") * col("__ct").cast("double") /
      col("__N").cast("double")
    val d = col("n").cast("double") - e
    long2x
      .join(broadcast(rowTot), "g")
      .join(broadcast(colTot), "side")
      .crossJoin(broadcast(total))
      .withColumn("exp_micros", round(e * lit(1e6)).cast("long"))
      .withColumn("chi2_micros",
        when(col("__ct") > 0, round(d * d / e * lit(1e6)).cast("long")))
      .select(col("g").as("grp"), col("grand_median"), col("side"),
        col("n"), col("exp_micros"), col("chi2_micros"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: do the event types share a median value-cents? */
  def moodMedianEvents(spark: SparkSession, dir: String): DataFrame =
    moodMedian(
      Tables.events(spark, dir).select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents")),
      "event_type", "cents")

  def oracleSql: String =
    """WITH cells AS (
      |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS v,
      |    CAST(count(*) AS HUGEINT) AS n
      |  FROM events GROUP BY 1, 2
      |), med AS (
      |  SELECT v AS grand_median FROM (
      |    SELECT v, nv,
      |      sum(nv) OVER (ORDER BY v
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |      sum(nv) OVER () AS tot
      |    FROM (SELECT v, sum(n) AS nv FROM cells GROUP BY v)
      |  ) WHERE 2 * cum >= tot AND 2 * (cum - nv) < tot
      |), sides AS (
      |  SELECT g, grand_median,
      |    CAST(sum(CASE WHEN v <= grand_median THEN n ELSE 0 END)
      |      AS BIGINT) AS n_le,
      |    CAST(sum(CASE WHEN v > grand_median THEN n ELSE 0 END)
      |      AS BIGINT) AS n_gt
      |  FROM cells CROSS JOIN med GROUP BY 1, 2
      |), long2x AS (
      |  SELECT g, grand_median, 'le_median' AS side, n_le AS n FROM sides
      |  UNION ALL
      |  SELECT g, grand_median, 'gt_median' AS side, n_gt AS n FROM sides
      |), m AS (
      |  SELECT l.*, rt.__rt, ct.__ct, t.__N
      |  FROM long2x l
      |  JOIN (SELECT g, sum(n) AS __rt FROM long2x GROUP BY g) rt USING (g)
      |  JOIN (SELECT side, sum(n) AS __ct FROM long2x GROUP BY side) ct
      |    USING (side)
      |  CROSS JOIN (SELECT sum(n) AS __N FROM long2x) t
      |)
      |SELECT g AS grp, grand_median, side, n,
      |  CAST(round(CAST(__rt AS DOUBLE) * CAST(__ct AS DOUBLE)
      |    / CAST(__N AS DOUBLE) * 1e6) AS BIGINT) AS exp_micros,
      |  CASE WHEN __ct > 0 THEN CAST(round(
      |    (CAST(n AS DOUBLE) - CAST(__rt AS DOUBLE) * CAST(__ct AS DOUBLE)
      |       / CAST(__N AS DOUBLE))
      |    * (CAST(n AS DOUBLE) - CAST(__rt AS DOUBLE) * CAST(__ct AS DOUBLE)
      |       / CAST(__N AS DOUBLE))
      |    / (CAST(__rt AS DOUBLE) * CAST(__ct AS DOUBLE)
      |       / CAST(__N AS DOUBLE)) * 1e6) AS BIGINT)
      |  END AS chi2_micros
      |FROM m""".stripMargin
}
