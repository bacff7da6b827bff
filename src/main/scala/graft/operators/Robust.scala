package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Median/MAD robust anomaly screen — the outlier detector that
  * survives the outliers it hunts (mean/stddev get dragged by the tail;
  * the median and the median-absolute-deviation don't), completing the
  * DQ family ([[DataQuality]] expectations, [[DigitProfile]] Benford,
  * [[Drift]] PSI) with per-row flagging. The reference eyeballs
  * column profiles (/root/reference/DataEngineering/Python/
  * discover_schema.py); this is the automated robust version.
  *
  * Exactness: both medians are DISCRETE indexed order statistics
  * (element at index n DIV 2, the sft_length_stats convention — never
  * interpolated), computed by histogram cumulation so windows run over
  * (group, value) CELLS, not raw rows. Deviations reaggregate the first
  * histogram (|c − med| on cells, counts summed), so raw rows are
  * touched exactly once. The 3×MAD outlier rule is integer arithmetic
  * end-to-end.
  */
object Robust {

  /** (group, n, median_cents, mad_cents, n_outliers): outliers are rows
    * with |cents − median| > 3·MAD. Groups where MAD = 0 (over half the
    * mass on one value) flag every row off the median — the documented
    * degenerate case; callers gate on mad_cents > 0 if that is too
    * strict. */
  def madOutliers(df: DataFrame, groupCol: String,
                  valueCol: String): DataFrame = {
    val cells = df
      .select(col(groupCol).as("grp"),
        round(col(valueCol) * 100).cast("long").as("__c"))
      .groupBy("grp", "__c").agg(count(lit(1)).as("__cnt"))
    val tot = cells.groupBy("grp").agg(sum("__cnt").as("__n"))
    def indexedMedian(h: DataFrame, vCol: String, out: String): DataFrame = {
      val w = Window.partitionBy("grp").orderBy(col(vCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      h.withColumn("__cum", sum("__cnt").over(w))
        .join(tot, "grp")
        .groupBy("grp")
        .agg(min(when(col("__cum") > expr("__n DIV 2"), col(vCol))).as(out))
    }
    val med = indexedMedian(cells, "__c", "median_cents")
    val devCells = cells.join(med, "grp")
      .groupBy(col("grp"), abs(col("__c") - col("median_cents")).as("__d"))
      .agg(sum("__cnt").as("__cnt"))
    val mad = indexedMedian(devCells.withColumnRenamed("__d", "__c"), "__c", "mad_cents")
    cells.join(med, "grp").join(mad, "grp").join(tot, "grp")
      .groupBy(col("grp"), col("__n").as("n"),
        col("median_cents"), col("mad_cents"))
      .agg(sum(when(abs(col("__c") - col("median_cents")) > col("mad_cents") * 3,
        col("__cnt")).otherwise(0L)).as("n_outliers"))
      .select("grp", "n", "median_cents", "mad_cents", "n_outliers")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: robust value-outlier counts per event type. */
  def madOutliersEvents(spark: SparkSession, dir: String): DataFrame =
    madOutliers(Tables.events(spark, dir), "event_type", "value")
      .withColumnRenamed("grp", "event_type")

  def oracleSql: String =
    """WITH cells AS (
      |  SELECT event_type AS g, CAST(round(value * 100) AS BIGINT) AS c,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2
      |), tot AS (
      |  SELECT g, CAST(sum(cnt) AS BIGINT) AS n FROM cells GROUP BY 1
      |), med AS (
      |  SELECT g, min(CASE WHEN cum > n // 2 THEN c END) AS med FROM (
      |    SELECT g, c, sum(cnt) OVER (PARTITION BY g ORDER BY c
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |    FROM cells) JOIN tot USING (g) GROUP BY g
      |), dev AS (
      |  SELECT g, abs(c - med) AS d, sum(cnt) AS cnt
      |  FROM cells JOIN med USING (g) GROUP BY 1, 2
      |), mad AS (
      |  SELECT g, min(CASE WHEN cum > n // 2 THEN d END) AS mad FROM (
      |    SELECT g, d, sum(cnt) OVER (PARTITION BY g ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |    FROM dev) JOIN tot USING (g) GROUP BY g
      |)
      |SELECT g AS event_type, n, med AS median_cents, mad AS mad_cents,
      |  CAST(sum(CASE WHEN abs(c - med) > 3 * mad THEN cnt ELSE 0 END)
      |    AS BIGINT) AS n_outliers
      |FROM cells JOIN med USING (g) JOIN mad USING (g) JOIN tot USING (g)
      |GROUP BY 1, 2, 3, 4""".stripMargin

  /** Exact trimmed mean per group — the outlier-resistant location
    * estimate beside the MAD flagger above: drop exactly
    * k = ⌊n·trim‰/1000⌋ rows from EACH end of the value order and
    * average the rest, with cell-boundary partial takes computed
    * exactly from the histogram cumulation (one aggregate to the
    * domain-bounded value-cell table, windows at cell cardinality —
    * the rank_transform cost envelope; raw rows are never sorted).
    * All integer: sums in DECIMAL(38,0), the mean one truncating
    * micros division. */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
                  trimPermille: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(col(groupCol).as("grp"), col(valueCol).as("v"))
      .agg(count(lit(1)).as("c"), sum(col(valueCol)).cast("decimal(38,0)").as("vs"))
    val w = Window.partitionBy(col("grp")).orderBy(col("v"))
    val cum = cells
      .withColumn("cumc", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("grp"))))
      .withColumn("k", expr(s"(n * $trimPermille) div 1000"))
      // rows taken from the low end / high end inside THIS cell
      .withColumn("lowc", expr("least(c, greatest(0L, k - (cumc - c)))"))
      .withColumn("highc", expr("least(c, greatest(0L, cumc - (n - k)))"))
    cum.groupBy(col("grp"))
      .agg(max(col("n")).as("n"), max(col("k")).as("k_trim"),
        sum(col("vs")).as("__tot"),
        sum(col("lowc").cast("decimal(38,0)") * col("v")).as("__lo"),
        sum(col("highc").cast("decimal(38,0)") * col("v")).as("__hi"))
      .select(col("grp"), col("n"), col("k_trim"),
        expr("""CASE WHEN n - 2 * k_trim > 0 THEN
            (1000000 * (__tot - __lo - __hi)) div (n - 2 * k_trim)
          END""").as("trimmed_mean_micros"))
  }

  /** Gated instance: extendedprice whole units per return flag, 5%
    * trimmed from each end. */
  def trimmedMeanLineitem(spark: SparkSession, dir: String): DataFrame =
    trimmedMean(
      graft.Tables.lineitem(spark, dir).select(col("l_returnflag").as("flag"),
        round(col("l_extendedprice")).cast("long").as("price")),
      "flag", "price", trimPermille = 50L)

  def trimmedMeanOracleSql: String =
    """WITH cells AS (
      |  SELECT l_returnflag AS grp,
      |    CAST(round(l_extendedprice) AS BIGINT) AS v,
      |    CAST(count(*) AS BIGINT) AS c,
      |    CAST(sum(CAST(round(l_extendedprice) AS BIGINT)) AS HUGEINT) AS vs
      |  FROM lineitem GROUP BY 1, 2
      |), cum AS (
      |  SELECT grp, v, c, vs,
      |    sum(c) OVER (PARTITION BY grp ORDER BY v) AS cumc,
      |    sum(c) OVER (PARTITION BY grp) AS n
      |  FROM cells
      |), marked AS (
      |  SELECT grp, v, c, vs, cumc, n, (n * 50) // 1000 AS k,
      |    least(c, greatest(0, (n * 50) // 1000 - (cumc - c))) AS lowc,
      |    least(c, greatest(0, cumc - (n - (n * 50) // 1000))) AS highc
      |  FROM cum
      |)
      |SELECT grp, CAST(max(n) AS BIGINT) AS n,
      |  CAST(max(k) AS BIGINT) AS k_trim,
      |  CASE WHEN max(n) - 2 * max(k) > 0 THEN CAST(
      |    (1000000 * (sum(vs) - sum(CAST(lowc AS HUGEINT) * v)
      |                 - sum(CAST(highc AS HUGEINT) * v)))
      |      // (max(n) - 2 * max(k)) AS BIGINT) END AS trimmed_mean_micros
      |FROM marked GROUP BY grp""".stripMargin
}
