package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Kaplan-Meier product-limit survival curve in exact integer permicro
  * — right-censored time-to-event analysis over the event feed
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py events):
  * how long from first touch until conversion, with users who never
  * convert CENSORED at their last observed event, not dropped — the
  * estimator conversion_lag's complete-case mean cannot replace.
  *
  * The product Π (1 − dᵢ/nᵢ) is a RECURSION, so it runs under the
  * [[HoltWinters]] discipline: aggregate the per-user frame to
  * duration cells (calendar-bounded — durations live inside the
  * observation window), then ONE `aggregate` HOF fold over the sorted
  * cell array carrying (surv_permicro, at-risk remaining), with the
  * per-step update surv = (surv·(n−d)) div n — floor division on
  * non-negative integers, bit-identical to the DuckDB recursive CTE.
  * Censor-only steps multiply by n/n and keep surv EXACTLY (no drift).
  * The corpus is touched once by the per-user aggregate; the fold is
  * O(window days) at any scale.
  */
object Survival {

  /** KM curve rows (dur_days, n_risk, d_events, c_censored,
    * surv_permicro) from per-subject (durCol, eventCol: boolean). */
  def kaplanMeier(subjects: DataFrame, durCol: String, eventCol: String): DataFrame = {
    val cells = subjects.groupBy(col(durCol).cast("int").as("dur"))
      .agg(
        sum(when(col(eventCol), 1L).otherwise(0L)).as("d"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("c"))
    // bounded cells → one row: sorted array; the fold carries the
    // risk-set countdown so no window pass is needed at all
    cells
      .agg(expr("sort_array(collect_list(struct(dur, d, c)))").as("__cells"),
        sum(col("d") + col("c")).as("__n0"))
      .select(explode(expr(
        """aggregate(__cells,
          |  named_struct('surv', CAST(1000000 AS BIGINT), 'remaining', __n0,
          |    'out', CAST(array() AS ARRAY<STRUCT<dur: INT, n_risk: BIGINT,
          |      d_events: BIGINT, c_censored: BIGINT, surv_permicro: BIGINT>>)),
          |  (st, x) -> named_struct(
          |    'surv', (st.surv * (st.remaining - x.d)) div st.remaining,
          |    'remaining', st.remaining - x.d - x.c,
          |    'out', concat(st.out, array(named_struct(
          |      'dur', x.dur, 'n_risk', st.remaining,
          |      'd_events', x.d, 'c_censored', x.c,
          |      'surv_permicro',
          |        (st.surv * (st.remaining - x.d)) div st.remaining)))),
          |  st -> st.out)""".stripMargin)).as("__r"))
      .select(col("__r.dur").as("dur_days"), col("__r.n_risk"),
        col("__r.d_events"), col("__r.c_censored"), col("__r.surv_permicro"))
  }

  /** Nelson-Aalen cumulative hazard H(t) = Σ_{s≤t} d_s/n_s — the
    * hazard-scale companion of [[kaplanMeier]] (same risk-set walk,
    * additive instead of multiplicative). Unlike the KM product, the
    * SUM needs no recursion at all: n_risk at each duration is
    * n₀ − (prior events + prior censors), a plain window cumulative
    * over the bounded cell table, and the permicro increment
    * (10⁶·d) div n_risk accumulates with a second window sum. The
    * per-step truncating div IS the declared contract (bit-identical
    * cross-engine); error vs the true rational is < steps/10⁶. */
  def nelsonAalen(subjects: DataFrame, durCol: String, eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = subjects.groupBy(col(durCol).cast("int").as("dur"))
      .agg(
        sum(when(col(eventCol), 1L).otherwise(0L)).as("d"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("c"))
    // partition-less windows over the duration cell table only
    // (calendar-bounded, the rank_transform precedent)
    val wAll = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrior = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wUpTo = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, 0)
    cells
      .withColumn("n_risk",
        sum(col("d") + col("c")).over(wAll) -
          coalesce(sum(col("d") + col("c")).over(wPrior), lit(0L)))
      .withColumn("na_permicro",
        sum(expr("(1000000 * d) div n_risk")).over(wUpTo))
      .select(col("dur").as("dur_days"), col("n_risk"),
        col("d").as("d_events"), col("c").as("c_censored"),
        col("na_permicro"))
  }

  // ---- query-map entries (hash-gated) ----

  /** Per-user (duration, converted?) frame: days from a user's first
    * event to their first high-value purchase (value > 150); users
    * without one are censored at their last observed event. */
  private def subjectsEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        min(col("ts").cast("date")).as("start"),
        min(when(col("event_type") === "purchase" && col("value") > 150,
          col("ts").cast("date"))).as("conv"),
        max(col("ts").cast("date")).as("last"))
      .select(
        datediff(coalesce(col("conv"), col("last")), col("start")).as("dur"),
        col("conv").isNotNull.as("ev"))

  /** Gated KM instance over the high-value-purchase cohort. */
  def survivalEvents(spark: SparkSession, dir: String): DataFrame =
    kaplanMeier(subjectsEvents(spark, dir), "dur", "ev")

  /** Gated Nelson-Aalen instance over the same cohort. */
  def nelsonAalenEvents(spark: SparkSession, dir: String): DataFrame =
    nelsonAalen(subjectsEvents(spark, dir), "dur", "ev")

  def oracleSql: String =
    """WITH RECURSIVE per AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS start,
      |    min(CASE WHEN event_type = 'purchase' AND value > 150
      |      THEN CAST(ts AS DATE) END) AS conv,
      |    max(CAST(ts AS DATE)) AS last_d
      |  FROM events GROUP BY 1
      |), subj AS (
      |  SELECT CAST(date_diff('day', start, coalesce(conv, last_d)) AS INT) AS dur,
      |    conv IS NOT NULL AS ev
      |  FROM per
      |), cells AS (
      |  SELECT dur, CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS c
      |  FROM subj GROUP BY 1
      |), ord AS (
      |  SELECT dur, d, c, row_number() OVER (ORDER BY dur) AS rn FROM cells
      |), tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n0 FROM cells),
      |km AS (
      |  SELECT o.rn, o.dur, t.n0 AS n_risk, o.d, o.c,
      |    (1000000 * (t.n0 - o.d)) // t.n0 AS surv
      |  FROM ord o CROSS JOIN tot t WHERE o.rn = 1
      |  UNION ALL
      |  SELECT o.rn, o.dur, km.n_risk - km.d - km.c AS n_risk, o.d, o.c,
      |    (km.surv * (km.n_risk - km.d - km.c - o.d))
      |      // (km.n_risk - km.d - km.c) AS surv
      |  FROM km JOIN ord o ON o.rn = km.rn + 1
      |)
      |SELECT dur AS dur_days, n_risk, d AS d_events, c AS c_censored,
      |  surv AS surv_permicro
      |FROM km""".stripMargin

  /** τ-restricted mean survival time — the single-number summary a
    * KM curve feeds a business decision as: "expected conversion-free
    * days within the first τ" (means of censored data are undefined;
    * RMST = ∫₀^τ S(t)dt is the estimable replacement, Royston–Parmar's
    * recommended reporting scale). Computed EXACTLY on the QUANTIZED
    * curve the gated KM key already emits (quantize-then-combine): the
    * step integral Σ S_permicro(tᵢ)·(min(tᵢ₊₁,τ) − min(tᵢ,τ)) plus the
    * S = 1 segment [0, t₁) — pure integer micro·days. The last step
    * extends to τ (the restriction IS the contract for what lies
    * beyond follow-up). One partition-less lead window over the
    * duration-cell-bounded KM frame. */
  def rmst(km: DataFrame, tauDays: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("dur_days")
    km
      .withColumn("__next", coalesce(
        lead(col("dur_days"), 1).over(w), lit(tauDays)))
      .withColumn("__w", greatest(lit(0),
        least(col("__next").cast("int"), lit(tauDays))
          - least(col("dur_days").cast("int"), lit(tauDays))))
      .agg(
        count(lit(1)).as("n_steps"),
        min(col("dur_days")).cast("int").as("__t1"),
        sum(col("surv_permicro") * col("__w")).as("__tail"))
      .select(lit(tauDays).as("tau_days"), col("n_steps"),
        (lit(1000000L) * least(col("__t1"), lit(tauDays)).cast("long")
          + col("__tail")).as("rmst_micro_days"))
  }

  /** Gated RMST instance: expected conversion-free days within the
    * first 30, from the SAME quantized KM curve `survival_km` gates. */
  def rmstEvents(spark: SparkSession, dir: String): DataFrame =
    rmst(kaplanMeier(subjectsEvents(spark, dir), "dur", "ev"), tauDays = 30)

  def rmstOracleSql: String = {
    val km = oracleSql
    s"""WITH kmout AS (
       |${km.linesIterator.map("  " + _).mkString("\n")}
       |), stepped AS (
       |  SELECT dur_days, surv_permicro,
       |    coalesce(lead(dur_days) OVER (ORDER BY dur_days), 30) AS nxt
       |  FROM kmout
       |)
       |SELECT CAST(30 AS BIGINT) AS tau_days,
       |  CAST(count(*) AS BIGINT) AS n_steps,
       |  CAST(1000000 * least((SELECT min(dur_days) FROM kmout), 30)
       |    + sum(surv_permicro * greatest(0, least(nxt, 30)
       |        - least(dur_days, 30))) AS BIGINT) AS rmst_micro_days
       |FROM stepped""".stripMargin
  }

  def nelsonAalenOracleSql: String =
    """WITH per AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS start,
      |    min(CASE WHEN event_type = 'purchase' AND value > 150
      |      THEN CAST(ts AS DATE) END) AS conv,
      |    max(CAST(ts AS DATE)) AS last_d
      |  FROM events GROUP BY 1
      |), subj AS (
      |  SELECT CAST(date_diff('day', start, coalesce(conv, last_d)) AS INT) AS dur,
      |    conv IS NOT NULL AS ev
      |  FROM per
      |), cells AS (
      |  SELECT dur, CAST(sum(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
      |    CAST(sum(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS c
      |  FROM subj GROUP BY 1
      |), risk AS (
      |  SELECT dur, d, c,
      |    sum(d + c) OVER () -
      |      coalesce(sum(d + c) OVER (ORDER BY dur
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
      |  FROM cells
      |)
      |SELECT dur AS dur_days, CAST(n_risk AS BIGINT) AS n_risk,
      |  d AS d_events, c AS c_censored,
      |  CAST(sum((1000000 * d) // n_risk) OVER (ORDER BY dur
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS na_permicro
      |FROM risk""".stripMargin

  /** Two-sample log-rank test — the hypothesis-test completion of the
    * family: [[kaplanMeier]] draws the curves, this decides whether
    * they differ. O−E accumulates over the SAME duration-cell walk:
    * at each time, e1 += (10⁶·d·n₁)÷n and the hypergeometric variance
    * v += staged truncating divisions of d·n₁·n₂·(n−d) by n, n, n−1 —
    * each stage's quotient ≤ 10⁶·d, so BIGINT `div` never overflows at
    * any N and the whole statistic is engine-exact by construction.
    * χ²_ppm = (10⁶O₁ − e1_micro)² div v_micro, the micro scales
    * cancelling. Accumulators ride DECIMAL(38,0), reported as VARCHAR
    * digit strings (the canonical-type contract).
    *
    * Scale: one groupBy to (dur, group) cells bounded by
    * |durations|·2, partition-less windows over that bounded table
    * only (the [[nelsonAalen]] precedent), one final fold. */
  def logRank(subjects: DataFrame, durCol: String, eventCol: String,
              grpCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = subjects.groupBy(col(durCol).cast("int").as("dur"))
      .agg(
        sum(when(col(grpCol) && col(eventCol), 1L).otherwise(0L)).as("d1"),
        sum(when(col(grpCol) && !col(eventCol), 1L).otherwise(0L)).as("c1"),
        sum(when(!col(grpCol) && col(eventCol), 1L).otherwise(0L)).as("d2"),
        sum(when(!col(grpCol) && !col(eventCol), 1L).otherwise(0L)).as("c2"))
    val wAll = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrior = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = cells
      .withColumn("n1", sum(col("d1") + col("c1")).over(wAll) -
        coalesce(sum(col("d1") + col("c1")).over(wPrior), lit(0L)))
      .withColumn("n2", sum(col("d2") + col("c2")).over(wAll) -
        coalesce(sum(col("d2") + col("c2")).over(wPrior), lit(0L)))
      .withColumn("d", col("d1") + col("d2"))
      .withColumn("n", col("n1") + col("n2"))
    // staged truncating terms, every product DECIMAL-carried so BIGINT
    // multiplies never overflow at any risk-set size:
    //   t1 = (10⁶·d·n1) div n ≤ 10⁶·d; t2 = (t1·n2) div n ≤ t1;
    //   t3 = (t2·(n−d)) div (n−1) ≤ t2
    val t1 = "(1000000 * CAST(d AS DECIMAL(38,0)) * n1) div n"
    risk.agg(
        sum(col("d1")).as("o1"), sum(col("d2")).as("o2"),
        sum(expr(t1).cast("decimal(38,0)")).as("e1_micro"),
        sum(expr(s"""CASE WHEN n > 1 THEN
            (CAST((CAST($t1 AS DECIMAL(38,0)) * n2) div n
              AS DECIMAL(38,0)) * (n - d)) div (n - 1)
            ELSE 0L END""").cast("decimal(38,0)")).as("v_micro"))
      .crossJoin(broadcast(risk.orderBy(col("dur").asc).limit(1)
        .select(col("n1").as("n1_tot"), col("n2").as("n2_tot"))))
      .select(col("n1_tot").as("n1"), col("n2_tot").as("n2"),
        col("o1"), col("o2"),
        col("e1_micro").cast("string").as("e1_micro"),
        col("v_micro").cast("string").as("v_micro"),
        expr("""CASE WHEN v_micro > 0 THEN
            ((1000000 * CAST(o1 AS DECIMAL(38,0)) - e1_micro)
              * (1000000 * CAST(o1 AS DECIMAL(38,0)) - e1_micro))
              div v_micro END""").as("chi2_ppm"))
  }

  /** Gated log-rank instance: the same cohort split by whether the
    * user's FIRST observed event (by the (ts, event_id) total order)
    * is a click. */
  def logrankEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val grouped = Tables.events(spark, dir)
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("user_id"))
      .agg(
        min(col("ts").cast("date")).as("start"),
        min(when(col("event_type") === "purchase" && col("value") > 150,
          col("ts").cast("date"))).as("conv"),
        max(col("ts").cast("date")).as("last"),
        max(when(col("__rn") === 1, col("event_type") === "click"))
          .as("g1"))
      .select(
        datediff(coalesce(col("conv"), col("last")), col("start")).as("dur"),
        col("conv").isNotNull.as("ev"), col("g1"))
    logRank(grouped, "dur", "ev", "g1")
  }

  def logrankOracleSql: String =
    """WITH firsts AS (
      |  SELECT user_id, event_type, ts, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events
      |), per AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS start,
      |    min(CASE WHEN event_type = 'purchase' AND value > 150
      |      THEN CAST(ts AS DATE) END) AS conv,
      |    max(CAST(ts AS DATE)) AS last_d,
      |    max(CASE WHEN rn = 1 THEN event_type = 'click' END) AS g1
      |  FROM firsts
      |  GROUP BY 1
      |), subj AS (
      |  SELECT CAST(date_diff('day', start, coalesce(conv, last_d)) AS INT) AS dur,
      |    conv IS NOT NULL AS ev, g1
      |  FROM per
      |), cells AS (
      |  SELECT dur,
      |    CAST(sum(CASE WHEN g1 AND ev THEN 1 ELSE 0 END) AS BIGINT) AS d1,
      |    CAST(sum(CASE WHEN g1 AND NOT ev THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(sum(CASE WHEN NOT g1 AND ev THEN 1 ELSE 0 END) AS BIGINT) AS d2,
      |    CAST(sum(CASE WHEN NOT g1 AND NOT ev THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |  FROM subj GROUP BY 1
      |), risk AS (
      |  SELECT dur, d1, d2,
      |    sum(d1 + c1) OVER () - coalesce(sum(d1 + c1) OVER (ORDER BY dur
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
      |    sum(d2 + c2) OVER () - coalesce(sum(d2 + c2) OVER (ORDER BY dur
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n2
      |  FROM cells
      |), terms AS (
      |  SELECT dur, d1, d2, n1, n2, d1 + d2 AS d, n1 + n2 AS n FROM risk
      |), agg AS (
      |  SELECT
      |    CAST(sum(d1) AS BIGINT) AS o1, CAST(sum(d2) AS BIGINT) AS o2,
      |    CAST(sum((1000000 * CAST(d AS HUGEINT) * n1) // n) AS HUGEINT)
      |      AS e1_micro,
      |    CAST(sum(CASE WHEN n > 1 THEN
      |      (((((1000000 * CAST(d AS HUGEINT) * n1) // n) * n2) // n)
      |        * (n - d)) // (n - 1)
      |      ELSE 0 END) AS HUGEINT) AS v_micro
      |  FROM terms
      |), tots AS (
      |  SELECT n1 AS n1_tot, n2 AS n2_tot FROM terms ORDER BY dur LIMIT 1
      |)
      |SELECT CAST(t.n1_tot AS BIGINT) AS n1, CAST(t.n2_tot AS BIGINT) AS n2,
      |  a.o1, a.o2,
      |  CAST(a.e1_micro AS VARCHAR) AS e1_micro,
      |  CAST(a.v_micro AS VARCHAR) AS v_micro,
      |  CASE WHEN a.v_micro > 0 THEN CAST(
      |    ((1000000 * CAST(a.o1 AS HUGEINT) - a.e1_micro)
      |      * (1000000 * CAST(a.o1 AS HUGEINT) - a.e1_micro))
      |      // a.v_micro AS BIGINT) END AS chi2_ppm
      |FROM agg a CROSS JOIN tots t""".stripMargin
}
