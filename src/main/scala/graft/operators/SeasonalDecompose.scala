package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Additive seasonal decomposition (trend / weekly seasonal / residual)
  * in EXACT integer arithmetic — the classical-decomposition companion
  * of [[HoltWinters]]/[[Theta]]/[[Autocorr]]: the reference's forecast
  * tuning (/root/reference/MachineLearning/Kubernetes/src/
  * stats_forecast_tune.py) presumes exactly this structure (ETS's
  * error/trend/season), and decomposition is how a pipeline INSPECTS it.
  *
  * Exactness discipline — no division until the final permicro: the
  * centered 7-day moving average rides as its SUM (trend_sum7); the
  * detrended series as detr7 = 7·x − trend_sum7 (the ×7-scaled exact
  * value); the day-of-week seasonal mean as (seas_num, seas_cnt) with
  * implicit denominator 7·cnt; the residual as the exact rational
  * resid_num/resid_den = (detr7·cnt − seas_num)/(7·cnt). Reported
  * permicro values use sign-split truncating division (identical in
  * both engines). Edge days without a full 7-day window carry NULL
  * trend/detrended/residual — the honest classical-MA convention.
  *
  * Scale: one fact aggregation to calendar-bounded (group, day) cells;
  * every window partitions by group over those cells; the seasonal
  * aggregate has ≤ 7 rows per group. Nothing after the rollup is
  * fact-sized.
  */
object SeasonalDecompose {

  /** Decompose per-group daily integer series (groupCol, idx 1.., x). */
  def decompose(cells: DataFrame, groupCol: String, idxCol: String,
                valueCol: String): DataFrame = {
    val g = col(groupCol)
    val wMa = Window.partitionBy(g).orderBy(col(idxCol)).rowsBetween(-3, 3)
    val base = cells.select(g, col(idxCol).as("idx"), col(valueCol).as("x"))
      .withColumn("__w7", count(lit(1)).over(wMa))
      .withColumn("trend_sum7",
        when(col("__w7") === 7, sum("x").over(wMa)))
      .withColumn("detr7", lit(7) * col("x") - col("trend_sum7"))
      .withColumn("dow", (col("idx") - 1) % 7)
    val seas = base.filter(col("detr7").isNotNull)
      .groupBy(g, col("dow"))
      .agg(sum("detr7").as("seas_num"), count(lit(1)).as("seas_cnt"))
    base.join(seas, Seq(groupCol, "dow"), "left")
      .select(g, col("idx"), col("dow"), col("x"), col("trend_sum7"),
        col("detr7"), col("seas_num"), col("seas_cnt"),
        expr("detr7 * seas_cnt - seas_num").as("resid_num"),
        expr("CASE WHEN detr7 IS NOT NULL THEN 7 * seas_cnt END").as("resid_den"),
        expr("""CASE WHEN seas_cnt > 0 THEN
                  (CASE WHEN seas_num < 0 THEN -1L ELSE 1L END)
                    * ((1000000 * abs(seas_num)) div (7 * seas_cnt))
                END""").as("seasonal_permicro"),
        expr("""CASE WHEN detr7 IS NOT NULL AND seas_cnt > 0 THEN
                  (CASE WHEN detr7 * seas_cnt - seas_num < 0 THEN -1L ELSE 1L END)
                    * ((1000000 * abs(detr7 * seas_cnt - seas_num))
                        div (7 * seas_cnt))
                END""").as("residual_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: each event type's daily revenue-cents series
    * decomposed against a weekly season. */
  def decomposeEvents(spark: SparkSession, dir: String): DataFrame = {
    val wIdx = Window.partitionBy("event_type").orderBy("day")
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("idx", row_number().over(wIdx))
    decompose(daily, "event_type", "idx", "cents")
  }

  def oracleSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2
      |), cells AS (
      |  SELECT event_type,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS idx,
      |    cents AS x
      |  FROM daily
      |), ma AS (
      |  SELECT event_type, idx, x,
      |    count(*) OVER w7 AS w7,
      |    CASE WHEN count(*) OVER w7 = 7
      |      THEN CAST(sum(x) OVER w7 AS BIGINT) END AS trend_sum7
      |  FROM cells
      |  WINDOW w7 AS (PARTITION BY event_type ORDER BY idx
      |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
      |), detr AS (
      |  SELECT event_type, idx, (idx - 1) % 7 AS dow, x, trend_sum7,
      |    7 * x - trend_sum7 AS detr7
      |  FROM ma
      |), seas AS (
      |  SELECT event_type, dow,
      |    CAST(sum(detr7) AS BIGINT) AS seas_num,
      |    count(*) AS seas_cnt
      |  FROM detr WHERE detr7 IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT d.event_type, d.idx, CAST(d.dow AS BIGINT) AS dow, d.x,
      |  d.trend_sum7, d.detr7, s.seas_num, s.seas_cnt,
      |  d.detr7 * s.seas_cnt - s.seas_num AS resid_num,
      |  CASE WHEN d.detr7 IS NOT NULL THEN 7 * s.seas_cnt END AS resid_den,
      |  CASE WHEN s.seas_cnt > 0 THEN
      |    (CASE WHEN s.seas_num < 0 THEN -1 ELSE 1 END)
      |      * ((1000000 * abs(s.seas_num)) // (7 * s.seas_cnt)) END
      |    AS seasonal_permicro,
      |  CASE WHEN d.detr7 IS NOT NULL AND s.seas_cnt > 0 THEN
      |    (CASE WHEN d.detr7 * s.seas_cnt - s.seas_num < 0 THEN -1 ELSE 1 END)
      |      * ((1000000 * abs(d.detr7 * s.seas_cnt - s.seas_num))
      |          // (7 * s.seas_cnt)) END
      |    AS residual_permicro
      |FROM detr d LEFT JOIN seas s
      |  ON s.event_type = d.event_type AND s.dow = d.dow""".stripMargin

  /** Seasonal STRENGTH per group — the one-number readout of the
    * decomposition (Hyndman's F_s = 1 − Var(remainder)/Var(detrended),
    * the forecast-tuning screen for "is there a season worth
    * modeling"): both variances are computed over the DETERMINISTIC
    * permicro quantizations the gated decomposition already emits
    * (detrended = sign-split (10⁶·detr7) div 7), as n²-scaled
    * DECIMAL(38) sums of squares — so the ratio is engine-exact; a
    * near-zero residual SS ⇒ strength → 10⁶. Rows without a full MA
    * window are excluded on both engines identically. */
  def seasonalStrength(spark: SparkSession, dir: String): DataFrame = {
    val d = decomposeEvents(spark, dir)
      .filter(col("detr7").isNotNull && col("seas_cnt") > 0)
      .select(col("event_type"),
        expr("""(CASE WHEN detr7 < 0 THEN -1L ELSE 1L END)
            * ((1000000 * abs(detr7)) div 7)""").as("dp"),
        col("residual_permicro").as("rp"))
    d.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days_used"),
        sum(col("dp").cast("decimal(38,0)") * col("dp")).as("sdd"),
        sum(col("dp")).cast("decimal(38,0)").as("sd"),
        sum(col("rp").cast("decimal(38,0)") * col("rp")).as("srr"),
        sum(col("rp")).cast("decimal(38,0)").as("sr"))
      .select(col("event_type"), col("n_days_used"),
        (col("n_days_used") * col("sdd") - col("sd") * col("sd")).as("ss_detrended"),
        (col("n_days_used") * col("srr") - col("sr") * col("sr")).as("ss_residual"))
      .withColumn("strength_permicro", expr(
        """CASE WHEN ss_detrended > 0 THEN
             (CASE WHEN ss_detrended < ss_residual THEN -1L ELSE 1L END)
               * ((1000000 * abs(ss_detrended - ss_residual)) div ss_detrended)
           END"""))
      // ss_* report as VARCHAR: DECIMAL(38,0) is the internal
      // accumulator; the gate's value-hash canonicalizes decimals
      // engine-specifically, so the digit string is the bit-exact
      // cross-engine contract.
      .select(col("event_type"), col("n_days_used"),
        col("ss_detrended").cast("string").as("ss_detrended"),
        col("ss_residual").cast("string").as("ss_residual"),
        col("strength_permicro"))
  }

  /** Seasonal-residual anomaly flags — the S-ESD-style pass a metrics
    * pipeline runs AFTER decomposition: [[Hampel]] flags against a
    * ±3-day ROLLING median (local level shifts), this flags against
    * the PER-SERIES median/MAD of the deseasonalized residual, so a
    * spike on "a busy Friday" isn't excused by its busy neighbors —
    * the weekly season is already subtracted. Same quantized threshold
    * contract as Hampel: anomalous iff 10⁴·|r − med| > 44478·mad
    * (3·1.4826 quantized once at 10⁻⁴).
    *
    * Exactness: r is the decomposition's deterministic
    * residual_permicro; med and mad are exact LOWER medians from
    * per-group value-cell walks ([[WeightedMedian]]'s division-free
    * `2·cum ≥ n` crossing test); the flag is a pure integer
    * comparison. A constant-residual series (mad = 0) flags any
    * nonzero deviation — the degenerate-MAD convention, documented
    * rather than NULLed.
    *
    * Scale: the decomposition's calendar-bounded cell table is
    * checkpointed once; both median walks and the flag join run on
    * (group × residual-cell) frames, domain-bounded forever. */
  def residualAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val r = decomposeEvents(spark, dir)
      .filter(col("residual_permicro").isNotNull)
      .select(col("event_type"), col("idx"), col("x"),
        col("residual_permicro").as("r"))
      .localCheckpoint() // consumed by two median walks AND the flags

    def lowerMedian(df: DataFrame, valCol: String, out: String): DataFrame = {
      val wCum = Window.partitionBy("event_type").orderBy(valCol)
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy("event_type")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      df.groupBy(col("event_type"), col(valCol))
        .agg(count(lit(1)).as("__n"))
        .withColumn("__cum", sum("__n").over(wCum))
        .withColumn("__tot", sum("__n").over(wAll))
        .filter(expr("2 * __cum >= __tot") && expr("2 * (__cum - __n) < __tot"))
        .select(col("event_type"), col(valCol).as(out))
    }

    val med = lowerMedian(r, "r", "med")
    val dev = r.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("r") - col("med")))
      .localCheckpoint() // consumed by the MAD walk AND the flags
    val mad = lowerMedian(dev, "dev", "mad")
    dev.join(broadcast(mad), Seq("event_type"))
      .select(col("event_type"), col("idx"), col("x"),
        col("r").as("residual_permicro"), col("med"), col("mad"),
        (lit(10000L) * col("dev") > lit(44478L) * col("mad"))
          .as("is_anomaly"))
  }

  def anomaliesOracleSql: String = {
    val base = oracleSql
    s"""WITH decomp AS (
      |${base.linesIterator.map("  " + _).mkString("\n")}
      |), r AS (
      |  SELECT event_type, idx, x, residual_permicro AS r
      |  FROM decomp WHERE residual_permicro IS NOT NULL
      |), medw AS (
      |  SELECT event_type, r AS v, count(*) AS n FROM r GROUP BY 1, 2
      |), med AS (
      |  SELECT event_type, v AS med FROM (
      |    SELECT event_type, v, n,
      |      sum(n) OVER (PARTITION BY event_type ORDER BY v
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |      sum(n) OVER (PARTITION BY event_type) AS tot
      |    FROM medw
      |  ) WHERE 2 * cum >= tot AND 2 * (cum - n) < tot
      |), dev AS (
      |  SELECT r.event_type, r.idx, r.x, r.r, m.med,
      |    abs(r.r - m.med) AS dev
      |  FROM r JOIN med m ON m.event_type = r.event_type
      |), madw AS (
      |  SELECT event_type, dev AS v, count(*) AS n FROM dev GROUP BY 1, 2
      |), mad AS (
      |  SELECT event_type, v AS mad FROM (
      |    SELECT event_type, v, n,
      |      sum(n) OVER (PARTITION BY event_type ORDER BY v
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |      sum(n) OVER (PARTITION BY event_type) AS tot
      |    FROM madw
      |  ) WHERE 2 * cum >= tot AND 2 * (cum - n) < tot
      |)
      |SELECT d.event_type, d.idx, d.x, d.r AS residual_permicro,
      |  d.med, m.mad, 10000 * d.dev > 44478 * m.mad AS is_anomaly
      |FROM dev d JOIN mad m ON m.event_type = d.event_type""".stripMargin
  }

  def strengthOracleSql: String = {
    val base = oracleSql
    // reuse the decomposition chain verbatim as a subquery
    s"""WITH decomp AS (
      |${base.linesIterator.map("  " + _).mkString("\n")}
      |), q AS (
      |  SELECT event_type,
      |    (CASE WHEN detr7 < 0 THEN -1 ELSE 1 END)
      |      * ((1000000 * abs(detr7)) // 7) AS dp,
      |    residual_permicro AS rp
      |  FROM decomp WHERE detr7 IS NOT NULL AND seas_cnt > 0
      |), agg AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days_used,
      |    CAST(sum(CAST(dp AS HUGEINT) * dp) AS HUGEINT) AS sdd,
      |    CAST(sum(dp) AS HUGEINT) AS sd,
      |    CAST(sum(CAST(rp AS HUGEINT) * rp) AS HUGEINT) AS srr,
      |    CAST(sum(rp) AS HUGEINT) AS sr
      |  FROM q GROUP BY 1
      |)
      |SELECT event_type, n_days_used,
      |  CAST(n_days_used * sdd - sd * sd AS VARCHAR) AS ss_detrended,
      |  CAST(n_days_used * srr - sr * sr AS VARCHAR) AS ss_residual,
      |  CASE WHEN n_days_used * sdd - sd * sd > 0 THEN CAST(
      |    (CASE WHEN n_days_used * sdd - sd * sd < n_days_used * srr - sr * sr
      |      THEN -1 ELSE 1 END)
      |    * ((1000000 * abs((n_days_used * sdd - sd * sd)
      |          - (n_days_used * srr - sr * sr)))
      |        // (n_days_used * sdd - sd * sd)) AS BIGINT) END
      |    AS strength_permicro
      |FROM agg""".stripMargin
  }
}
