package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Theil-Sen robust trend estimator (median of pairwise slopes) over
  * per-series daily aggregates — the outlier-proof companion of
  * [[graft.ml.LinRegNormalEq]]'s least-squares line and the trend
  * readout a monitored ingestion wants when one bad backfill day would
  * wreck an OLS slope (29.3% breakdown point vs 0%). Reference
  * anchor: the drift/trend checks around
  * /root/reference/DataEngineering/DataBricks/spark_stream.py
  * scoreboards; estimator is public (Theil 1950, Sen 1968).
  *
  * Exactness discipline: slopes are RATIONALS dy/dx. The median is
  * selected by ordering on the IEEE double dy/dx — bit-identical
  * cross-engine for BIGINT-exact operands — with ties broken by
  * (dy, dx), and the REPORTED value is computed from the selected
  * pair's integers with the sign-split truncating div
  * (10⁶·|dy|) div dx, so no float ever reaches the output. The
  * intercept is the lower median of the integer residual levels
  * 10⁶·y − slope_permicro·x. Lower median ((cnt+1) div 2) is the
  * declared contract for even counts.
  *
  * Scale: the fact table is touched ONCE by the daily aggregate; the
  * pairwise join runs on the per-series CELL table, bounded by the
  * calendar (d days → d(d−1)/2 pairs per series, ~6.7M at a 10-year
  * window — independent of row count forever). Pair generation and
  * both median windows partition by series key, so series parallelize
  * across executors.
  */
object TheilSen {

  /** Per-series Theil-Sen fit over (seriesCol, xCol: int day index,
    * yCol: long level). Returns (series, n_days, n_pairs,
    * slope_permicro, intercept_permicro). With `seasonCol` set this is
    * the Hirsch-Slack SEASONAL Sen slope: pairs form only WITHIN a
    * season stratum (the magnitude companion of `seasonal_mk`, immune
    * to a weekly cycle masquerading as short-lag slope noise), the
    * median pools the within-stratum slopes across strata. */
  def fit(daily: DataFrame, seriesCol: String, xCol: String,
          yCol: String, seasonCol: Option[String] = None): DataFrame = {
    val d = daily.select((Seq(col(seriesCol).as("g"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y")) ++
      seasonCol.map(c => col(c).as("__sn"))): _*)
    val pairCond = seasonCol match {
      case Some(_) => col("a.g") === col("b.g") &&
        col("a.__sn") === col("b.__sn") && col("a.x") < col("b.x")
      case None => col("a.g") === col("b.g") && col("a.x") < col("b.x")
    }
    val pairs = d.as("a").join(d.as("b"), pairCond)
      .select(col("a.g").as("g"),
        (col("b.y") - col("a.y")).as("dy"),
        (col("b.x") - col("a.x")).as("dx"))
    val wSlope = Window.partitionBy("g")
      .orderBy((col("dy").cast("double") / col("dx").cast("double")).asc,
        col("dy").asc, col("dx").asc)
    val medianPair = pairs
      .withColumn("__r", row_number().over(wSlope))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("__r") === expr("(__cnt + 1) div 2"))
      .select(col("g"), col("__cnt").as("n_pairs"),
        expr("""(CASE WHEN dy < 0 THEN -1L ELSE 1L END)
            * ((1000000 * abs(dy)) div dx)""").as("slope_permicro"))
    val resid = d.join(medianPair, "g")
      .withColumn("__iv", lit(1000000L) * col("y")
        - col("slope_permicro") * col("x"))
    val wIv = Window.partitionBy("g").orderBy(col("__iv").asc)
    resid
      .withColumn("__r", row_number().over(wIv))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("g")))
      .filter(col("__r") === expr("(__n + 1) div 2"))
      .select(col("g"), col("__n").as("n_days"), col("n_pairs"),
        col("slope_permicro"), col("__iv").as("intercept_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: robust daily-event-count trend per event_type;
    * x is days since the series' own first day. */
  def theilSenEvents(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
    val withX = daily
      .withColumn("__d0",
        min(col("day")).over(Window.partitionBy("event_type")))
      .select(col("event_type"), datediff(col("day"), col("__d0")).as("x"),
        col("y"))
    fit(withX, "event_type", "x", "y")
      .select(col("g").as("event_type"), col("n_days"), col("n_pairs"),
        col("slope_permicro"), col("intercept_permicro"))
  }

  /** Gated instance: seasonal Sen slope per event type — pairs only
    * within the same weekday (days since the Monday 1970-01-05 mod 7,
    * the `seasonal_mk` stratum), so every slope is measured over whole
    * weeks and a weekly cycle cannot alias into it. */
  def senSlopeSeasonalEvents(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
    val withX = daily
      .withColumn("__d0",
        min(col("day")).over(Window.partitionBy("event_type")))
      .select(col("event_type"), datediff(col("day"), col("__d0")).as("x"),
        pmod(datediff(col("day"), lit("1970-01-05").cast("date")), lit(7))
          .as("dow"),
        col("y"))
    fit(withX, "event_type", "x", "y", seasonCol = Some("dow"))
      .select(col("g").as("event_type"), col("n_days"), col("n_pairs"),
        col("slope_permicro"), col("intercept_permicro"))
  }

  def senSlopeSeasonalOracleSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2
      |), pts AS (
      |  SELECT event_type AS g,
      |    CAST(date_diff('day', min(day) OVER (PARTITION BY event_type),
      |      day) AS BIGINT) AS x,
      |    ((day - DATE '1970-01-05') % 7 + 7) % 7 AS sn, y
      |  FROM daily
      |), pairs AS (
      |  SELECT a.g, b.y - a.y AS dy, b.x - a.x AS dx
      |  FROM pts a JOIN pts b ON a.g = b.g AND a.sn = b.sn AND a.x < b.x
      |), ranked AS (
      |  SELECT g, dy, dx,
      |    row_number() OVER (PARTITION BY g
      |      ORDER BY CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE), dy, dx) AS r,
      |    count(*) OVER (PARTITION BY g) AS cnt
      |  FROM pairs
      |), med AS (
      |  SELECT g, cnt AS n_pairs,
      |    (CASE WHEN dy < 0 THEN -1 ELSE 1 END)
      |      * ((1000000 * abs(dy)) // dx) AS slope_permicro
      |  FROM ranked WHERE r = (cnt + 1) // 2
      |), resid AS (
      |  SELECT pts.g, med.n_pairs, med.slope_permicro,
      |    1000000 * pts.y - med.slope_permicro * pts.x AS iv,
      |    row_number() OVER (PARTITION BY pts.g
      |      ORDER BY 1000000 * pts.y - med.slope_permicro * pts.x) AS r,
      |    count(*) OVER (PARTITION BY pts.g) AS n
      |  FROM pts JOIN med ON med.g = pts.g
      |)
      |SELECT g AS event_type, CAST(n AS BIGINT) AS n_days,
      |  CAST(n_pairs AS BIGINT) AS n_pairs,
      |  CAST(slope_permicro AS BIGINT) AS slope_permicro,
      |  CAST(iv AS BIGINT) AS intercept_permicro
      |FROM resid WHERE r = (n + 1) // 2""".stripMargin

  def oracleSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2
      |), pts AS (
      |  SELECT event_type AS g,
      |    CAST(date_diff('day', min(day) OVER (PARTITION BY event_type),
      |      day) AS BIGINT) AS x, y
      |  FROM daily
      |), pairs AS (
      |  SELECT a.g, b.y - a.y AS dy, b.x - a.x AS dx
      |  FROM pts a JOIN pts b ON a.g = b.g AND a.x < b.x
      |), ranked AS (
      |  SELECT g, dy, dx,
      |    row_number() OVER (PARTITION BY g
      |      ORDER BY CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE), dy, dx) AS r,
      |    count(*) OVER (PARTITION BY g) AS cnt
      |  FROM pairs
      |), med AS (
      |  SELECT g, cnt AS n_pairs,
      |    (CASE WHEN dy < 0 THEN -1 ELSE 1 END)
      |      * ((1000000 * abs(dy)) // dx) AS slope_permicro
      |  FROM ranked WHERE r = (cnt + 1) // 2
      |), resid AS (
      |  SELECT pts.g, med.n_pairs, med.slope_permicro,
      |    1000000 * pts.y - med.slope_permicro * pts.x AS iv,
      |    row_number() OVER (PARTITION BY pts.g
      |      ORDER BY 1000000 * pts.y - med.slope_permicro * pts.x) AS r,
      |    count(*) OVER (PARTITION BY pts.g) AS n
      |  FROM pts JOIN med ON med.g = pts.g
      |)
      |SELECT g AS event_type, CAST(n AS BIGINT) AS n_days,
      |  CAST(n_pairs AS BIGINT) AS n_pairs,
      |  CAST(slope_permicro AS BIGINT) AS slope_permicro,
      |  CAST(iv AS BIGINT) AS intercept_permicro
      |FROM resid WHERE r = (n + 1) // 2""".stripMargin
}
