package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Brown–Forsythe test (Levene's test with median centers) for equal
  * group variances — the homoscedasticity gate that decides whether a
  * pooled-variance comparison (t/ANOVA) is even admissible, run before
  * readouts like the reference's grouped model evaluation
  * (/root/reference/MachineLearning/Data/bootstrap_metrics.py). Beside
  * [[KruskalWallis]] (location shift) this tests SCALE shift; the
  * median center (Brown–Forsythe) rather than the mean makes it robust
  * to the heavy tails that motivate using it in the first place.
  *
  * Cell-histogram discipline (the [[Kendall]] pattern): the fact
  * aggregates ONCE to (group, value, n) cells bounded by the value
  * domain, the exact group median comes from the cell cumsum (doubled —
  * 2·median = x_(r1) + x_(r2) is ALWAYS an integer, so even-count
  * groups stay exact), and the absolute deviations z = |2x − 2·med|
  * are cell-level quantities weighted by n.
  *
  * Quantization contract: group means of z truncate ONCE to MILLIS
  * (not micros — deliberate: every staged `div` in Spark returns
  * BIGINT, so each quotient must stay under 2⁶³; milli² sum-of-squares
  * keep the final F numerator inside DECIMAL(38,0) to N ≈ 10¹¹ rows —
  * the 100 TB envelope — where micros² saturate near N ≈ 10⁸ with
  * extreme dispersion. Resolution floor: group-mean differences below
  * 10⁻³ of a doubled value unit read as zero SSB). The F ratio is ONE
  * truncating division of the fully cross-multiplied integers, so
  * degrees-of-freedom precision is never lost to staging.
  *
  * Scale: one map-side-combinable groupBy to the bounded cell table,
  * then per-group windows over ≤|domain| cells and broadcast joins —
  * the 100 TB cost is the scan.
  */
object LeveneTest {

  /** One row: (n, k_groups, ssb_milli2, ssw_milli2, f_ppm) for integer
    * `valueCol` grouped by `grpCol`. ssb/ssw are between/within sums
    * of squares of z = |2x − 2·median_g| in millis² (VARCHAR digit
    * strings — DECIMAL stays internal);
    * f_ppm = 10⁶·(ssb/(k−1))/(ssw/(n−k)) truncating. */
  def brownForsythe(df: DataFrame, grpCol: String, valueCol: String): DataFrame = {
    val cells = df
      .groupBy(col(grpCol).as("g"), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint() // reused: median ranks pass + deviation pass
    val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = cells
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("ng", sum(col("n")).over(Window.partitionBy(col("g"))))
    // 2·median = value at rank (ng+1) div 2 + value at rank ng div 2 + 1
    val med2 = cum.groupBy("g").agg(
      min(when(col("cum") >= expr("(ng + 1) div 2"), col("v"))).as("v1"),
      min(when(col("cum") >= expr("ng div 2 + 1"), col("v"))).as("v2"))
      .select(col("g"), (col("v1") + col("v2")).as("med2"))
    val dev = cells.join(broadcast(med2), "g")
      .select(col("g"), col("n"), abs(col("v") * 2 - col("med2")).as("z"))
    val grp = dev.groupBy("g").agg(
        sum(col("n")).as("ng"),
        sum(col("n").cast("decimal(38,0)") * col("z")).as("sz"))
      .withColumn("zbar_g_milli", expr("(1000 * sz) div ng"))
      .localCheckpoint() // reused: global mean + SSB + SSW join
    val tot = grp.agg(
        sum(col("ng")).as("n"), count(lit(1)).as("k"),
        sum(col("sz")).as("s"))
      .withColumn("zbar_milli", expr("(1000 * s) div n"))
    val ssb = grp.crossJoin(broadcast(tot.select("zbar_milli")))
      .agg(sum(col("ng").cast("decimal(38,0)")
        * (col("zbar_g_milli") - col("zbar_milli"))
        * (col("zbar_g_milli") - col("zbar_milli"))).as("ssb"))
    val ssw = dev.join(broadcast(grp.select("g", "zbar_g_milli")), "g")
      .agg(sum(col("n").cast("decimal(38,0)")
        * (col("z") * lit(1000L) - col("zbar_g_milli"))
        * (col("z") * lit(1000L) - col("zbar_g_milli"))).as("ssw"))
    tot.crossJoin(broadcast(ssb)).crossJoin(broadcast(ssw))
      .select(col("n"), col("k").as("k_groups"),
        col("ssb").cast("string").as("ssb_milli2"),
        col("ssw").cast("string").as("ssw_milli2"),
        expr("""CASE WHEN ssw > 0 THEN
            (1000000 * (n - k) * ssb) div ((k - 1) * ssw) END""")
          .as("f_ppm"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: does quantity dispersion differ across return
    * flags? (3 groups, domain ≤ 50 cells each). */
  def leveneLineitem(spark: SparkSession, dir: String): DataFrame =
    brownForsythe(Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("flag"),
      round(col("l_quantity")).cast("long").as("q")), "flag", "q")

  def oracleSql: String =
    """WITH cells AS (
      |  SELECT l_returnflag AS g, CAST(round(l_quantity) AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM lineitem GROUP BY 1, 2
      |), cum AS (
      |  SELECT g, v, n,
      |    sum(n) OVER (PARTITION BY g ORDER BY v) AS cum,
      |    sum(n) OVER (PARTITION BY g) AS ng
      |  FROM cells
      |), med2 AS (
      |  SELECT g,
      |    min(CASE WHEN cum >= (ng + 1) // 2 THEN v END)
      |      + min(CASE WHEN cum >= ng // 2 + 1 THEN v END) AS med2
      |  FROM cum GROUP BY g
      |), dev AS (
      |  SELECT c.g, c.n, abs(c.v * 2 - m.med2) AS z
      |  FROM cells c JOIN med2 m ON c.g = m.g
      |), grp AS (
      |  SELECT g, CAST(sum(n) AS BIGINT) AS ng,
      |    CAST(sum(CAST(n AS HUGEINT) * z) AS HUGEINT) AS sz,
      |    (1000 * CAST(sum(CAST(n AS HUGEINT) * z) AS HUGEINT))
      |      // CAST(sum(n) AS BIGINT) AS zbar_g_milli
      |  FROM dev GROUP BY g
      |), tot AS (
      |  SELECT CAST(sum(ng) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
      |    (1000 * sum(sz)) // sum(ng) AS zbar_milli
      |  FROM grp
      |), ssb AS (
      |  SELECT sum(CAST(g.ng AS HUGEINT)
      |    * (g.zbar_g_milli - t.zbar_milli)
      |    * (g.zbar_g_milli - t.zbar_milli)) AS ssb
      |  FROM grp g CROSS JOIN tot t
      |), ssw AS (
      |  SELECT sum(CAST(d.n AS HUGEINT)
      |    * (d.z * 1000 - g.zbar_g_milli)
      |    * (d.z * 1000 - g.zbar_g_milli)) AS ssw
      |  FROM dev d JOIN grp g ON d.g = g.g
      |)
      |SELECT t.n, t.k AS k_groups,
      |  CAST(b.ssb AS VARCHAR) AS ssb_milli2,
      |  CAST(w.ssw AS VARCHAR) AS ssw_milli2,
      |  CASE WHEN w.ssw > 0 THEN CAST(
      |    (1000000 * (t.n - t.k) * b.ssb) // ((t.k - 1) * w.ssw)
      |    AS BIGINT) END AS f_ppm
      |FROM tot t CROSS JOIN ssb b CROSS JOIN ssw w""".stripMargin
}
