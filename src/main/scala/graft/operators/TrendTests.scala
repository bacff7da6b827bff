package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Rank-based trend tests completing the nonparametric battery:
  * Mann-Kendall (monotone trend in ONE series — THE standard
  * companion of the [[TheilSen]] slope, which only estimates the
  * magnitude MK tests) and Friedman (consistent treatment ranking
  * across blocks — the repeated-measures sibling of
  * [[KruskalWallis]]'s one-way test). Both feed the same
  * model-selection loop as [[TsDiagnostics]]: "is there a trend worth
  * differencing / a seasonal ranking worth modeling?"
  *
  * Exactness: Mann-Kendall's S = Σ_{i<j} sign(y_j − y_i) is a pure
  * integer; its tie-corrected variance 18·V = n(n−1)(2n+5) −
  * Σ_t t(t−1)(2t+5) stays integer too, and the continuity-corrected
  * z = (|S|−1)·√18/√(18V) reports as sign·(10⁶·(|S|−1)·isqrt(18·V))
  * div (18·V·scaled)… — concretely z_permicro = sign(S) ·
  * ((10⁶·(|S|−1)·isqrt(18·V)) div V) with V the INTEGER 18-scaled
  * variance, two exact truncations shared by both engines
  * ([[Allocation.isqrtSql]]). Friedman uses DOUBLED average ranks
  * (ties stay integer) and reports the classic statistic
  * χ² = 12·ΣR_j²/(nk(k+1)) − 3n(k+1) in one staged permicro division,
  * on COMPLETE blocks only (days missing a treatment drop — the
  * standard complete-block requirement, enforced not assumed).
  *
  * Scale shape: MK's pair sum is a within-group self-join of the
  * calendar-bounded daily spine (≤ days²/2 pairs per group, forever —
  * the [[Kendall]] cell-pair argument with time as one axis); Friedman
  * is two bounded windows over (day × treatment) cells. Neither sees
  * fact-sized data after the rollup.
  */
object TrendTests {

  /** Mann-Kendall per group: (group, n, s_stat, var18, z_permicro).
    * var18 = 18·Var(S) exactly; z is continuity-corrected, NULL when
    * var18 = 0 (all values tied). */
  def mannKendall(cells: DataFrame, groupCol: String, idxCol: String,
                  valueCol: String): DataFrame = {
    val g = col(groupCol)
    val d38 = "decimal(38,0)"
    val base = cells.select(g, col(idxCol).as("i"),
      col(valueCol).cast(d38).as("y")).localCheckpoint() // self-joined
    val s = base.as("a")
      .join(base.as("b"),
        col(s"a.$groupCol") === col(s"b.$groupCol")
          && col("a.i") < col("b.i"))
      .groupBy(col(s"a.$groupCol").as(groupCol))
      .agg(sum(signum(col("b.y") - col("a.y")).cast(d38)).as("s_raw"))
    val ties = base.groupBy(g, col("y"))
      .agg(count(lit(1)).cast(d38).as("t"))
      .groupBy(g).agg(
        sum(col("t")).cast(d38).as("n"),
        sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5))
          .cast(d38).as("tt"))
    s.join(ties, Seq(groupCol))
      .withColumn("v18", expr("n * (n - 1) * (2 * n + 5) - tt"))
      .select(g, col("n").cast("long").as("n"),
        col("s_raw").cast("long").as("s_stat"),
        col("v18").cast("string").as("var18"),
        expr(s"""CASE WHEN v18 > 0 AND abs(s_raw) > 0 THEN
                   (CASE WHEN s_raw < 0 THEN -1L ELSE 1L END)
                     * ((CAST(1000000 AS DECIMAL(38,0)) * (abs(s_raw) - 1)
                         * ${Allocation.isqrtSql("(18 * v18)")}) div v18)
                 WHEN v18 > 0 THEN 0L END""").as("z_permicro"))
  }

  /** SEASONAL Mann-Kendall (Hirsch & Slack 1984) per group: the
    * trend test that is correct on seasonal series — plain MK reads a
    * weekly cycle as alternating trend noise; the seasonal form
    * compares days only WITHIN the same season stratum (here weekday)
    * and sums the per-stratum statistics: S = Σ_s S_s, 18·Var =
    * Σ_s [n_s(n_s−1)(2n_s+5) − tt_s] (independent strata), same
    * continuity-corrected z as [[mannKendall]]. The stratum is derived
    * by pure date arithmetic (days since a fixed Monday mod 7) so both
    * engines number weekdays identically. Pair volume: Σ_s n_s²/2 —
    * 7× FEWER pairs than plain MK on the same calendar-bounded spine. */
  def seasonalMannKendall(cells: DataFrame, groupCol: String,
                          seasonCol: String, idxCol: String,
                          valueCol: String): DataFrame = {
    val g = col(groupCol)
    val d38 = "decimal(38,0)"
    val base = cells.select(g, col(seasonCol).as("__sn"),
      col(idxCol).as("i"), col(valueCol).cast(d38).as("y"))
      .localCheckpoint() // self-joined
    val s = base.as("a")
      .join(base.as("b"),
        col(s"a.$groupCol") === col(s"b.$groupCol")
          && col("a.__sn") === col("b.__sn") && col("a.i") < col("b.i"))
      .groupBy(col(s"a.$groupCol").as(groupCol))
      .agg(sum(signum(col("b.y") - col("a.y")).cast(d38)).as("s_raw"))
    val strat = base.groupBy(g, col("__sn"), col("y"))
      .agg(count(lit(1)).cast(d38).as("t"))
      .groupBy(g, col("__sn")).agg(
        sum(col("t")).cast(d38).as("ns"),
        sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5))
          .cast(d38).as("tts"))
    val v = strat.groupBy(g).agg(
      sum(col("ns")).cast(d38).as("n"),
      sum(expr("ns * (ns - 1) * (2 * ns + 5) - tts")).cast(d38).as("v18"))
    s.join(v, Seq(groupCol))
      .select(g, col("n").cast("long").as("n"),
        col("s_raw").cast("long").as("s_stat"),
        col("v18").cast("string").as("var18"),
        expr(s"""CASE WHEN v18 > 0 AND abs(s_raw) > 0 THEN
                   (CASE WHEN s_raw < 0 THEN -1L ELSE 1L END)
                     * ((CAST(1000000 AS DECIMAL(38,0)) * (abs(s_raw) - 1)
                         * ${Allocation.isqrtSql("(18 * v18)")}) div v18)
                 WHEN v18 > 0 THEN 0L END""").as("z_permicro"))
  }

  /** Friedman over complete (block × treatment) cells: one row
    * (n_blocks, k_treatments, chi2_permicro) plus per-treatment rank
    * sums are NOT emitted here — [[friedmanRanks]] exposes them. */
  def friedman(cells: DataFrame, blockCol: String, treatCol: String,
               valueCol: String): DataFrame = {
    val ranks = friedmanRanks(cells, blockCol, treatCol, valueCol)
    val k = ranks.select(col(treatCol)).distinct().count()
    ranks
      .agg(max("n_blocks").as("n_blocks"),
        sum(expr("CAST(d_rank_sum AS DECIMAL(38,0))"
          + " * CAST(d_rank_sum AS DECIMAL(38,0))")).as("dd2"))
      .select(col("n_blocks"), lit(k).as("k_treatments"),
        // ΣR² = Σ(D/2)² = dd2/4 → 12·ΣR²/(nk(k+1)) = 3·dd2/(nk(k+1))
        expr(s"""(CAST(3000000 AS DECIMAL(38,0)) * dd2)
                   div (n_blocks * $k * ($k + 1))
                 - 3000000 * n_blocks * ($k + 1)""").as("chi2_permicro"))
  }

  /** Per-treatment doubled rank sums over COMPLETE blocks:
    * (treat, n_blocks, d_rank_sum) with d_rank_sum = Σ_blocks 2·rank
    * (average ranks doubled so ties stay integer). */
  def friedmanRanks(cells: DataFrame, blockCol: String, treatCol: String,
                    valueCol: String): DataFrame = {
    val b = col(blockCol)
    val k = cells.select(col(treatCol)).distinct().count()
    val complete = cells
      .withColumn("__kb", count(lit(1))
        .over(Window.partitionBy(b)))
      .filter(col("__kb") === k)
    // doubled average rank = rank + (rank + tiecount - 1)
    //                      = 2·rank + ties_below_same... via min/max rank
    val wB = Window.partitionBy(b).orderBy(col(valueCol))
    val ranked = complete
      .withColumn("__rmin", rank().over(wB))
      .withColumn("__cnt", count(lit(1))
        .over(Window.partitionBy(b, col(valueCol))))
      .withColumn("__d", col("__rmin") * 2 + col("__cnt") - 1)
    ranked.groupBy(col(treatCol))
      .agg(count(lit(1)).as("n_blocks"),
        sum("__d").cast("long").as("d_rank_sum"))
  }

  /** Page's L test for ORDERED alternatives — Friedman asks "do the
    * treatments differ at all?"; Page asks the sharper "do they
    * increase in THIS hypothesized order?", which is the right test
    * for dose-response / version-over-version questions. L = Σ_j j·R_j
    * over the hypothesized rank order j of the treatments; computed on
    * [[friedmanRanks]]' DOUBLED rank sums so ties stay integer:
    * l2_stat = Σ j·d_j = 2L, against the exact null mean
    * E[2L] = n·k·(k+1)²/2 (always even — exact). Treatment order is
    * the DECLARED `order` list — the hypothesis under test, not
    * data-derived. */
  def pageL(cells: DataFrame, blockCol: String, treatCol: String,
            valueCol: String, order: Seq[String]): DataFrame = {
    val spark = cells.sparkSession
    import spark.implicits._
    val ranks = friedmanRanks(cells, blockCol, treatCol, valueCol)
    val k = order.length
    val pos = order.zipWithIndex.map { case (t, i) => (t, (i + 1).toLong) }
      .toDF(treatCol, "j")
    ranks.join(broadcast(pos), Seq(treatCol))
      .agg(max("n_blocks").as("n_blocks"),
        sum(expr("j * d_rank_sum")).as("l2_stat"))
      .select(col("n_blocks"), lit(k.toLong).as("k_treatments"),
        col("l2_stat").cast("long").as("l2_stat"),
        // E[2L] = n·k·(k+1)²/2 — exact (n·k·(k+1)² is always even);
        // block-grid magnitudes, no overflow concern
        expr(s"(n_blocks * $k * ($k + 1) * ($k + 1)) div 2").as("e2_null"))
  }

  // ---- query-map entries (hash-gated) ----

  private def dailyCells(spark: SparkSession, dir: String): DataFrame = {
    val wIdx = Window.partitionBy("event_type").orderBy("day")
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("idx", row_number().over(wIdx))
  }

  def mannKendallEvents(spark: SparkSession, dir: String): DataFrame =
    mannKendall(dailyCells(spark, dir), "event_type", "idx", "cents")

  /** Seasonal MK per event type, weekday strata (days since the Monday
    * 1970-01-05, mod 7 — identical numbering on both engines). */
  def seasonalMkEvents(spark: SparkSession, dir: String): DataFrame =
    seasonalMannKendall(
      dailyCells(spark, dir)
        .withColumn("dow",
          pmod(datediff(col("day"), lit("1970-01-05").cast("date")), lit(7))),
      "event_type", "dow", "day", "cents")

  /** Friedman with days as blocks, event types as treatments. */
  def friedmanEvents(spark: SparkSession, dir: String): DataFrame =
    friedman(dailyCells(spark, dir), "day", "event_type", "cents")

  /** Page's L with the funnel order click→view→signup→purchase→error
    * as the tested monotone hypothesis (a DECLARED order — the gate
    * pins the arithmetic, not the hypothesis's truth). */
  val PageOrder = Seq("click", "view", "signup", "purchase", "error")
  def pageLEvents(spark: SparkSession, dir: String): DataFrame =
    pageL(dailyCells(spark, dir), "day", "event_type", "cents", PageOrder)

  def mannKendallOracleSql: String = {
    val isqrt = Allocation.isqrtDuckSql("(18 * v18)")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
       |  FROM events GROUP BY 1, 2
       |), cells AS (
       |  SELECT event_type, cents,
       |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
       |  FROM daily
       |), s AS (
       |  SELECT a.event_type,
       |    CAST(sum(CASE WHEN b.cents > a.cents THEN 1
       |      WHEN b.cents < a.cents THEN -1 ELSE 0 END) AS HUGEINT) AS s_raw
       |  FROM cells a JOIN cells b
       |    ON a.event_type = b.event_type AND a.i < b.i
       |  GROUP BY 1
       |), ties AS (
       |  SELECT event_type, CAST(sum(t) AS HUGEINT) AS n,
       |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS HUGEINT) AS tt
       |  FROM (SELECT event_type, cents, CAST(count(*) AS HUGEINT) AS t
       |        FROM cells GROUP BY 1, 2)
       |  GROUP BY 1
       |), v AS (
       |  SELECT s.event_type, s.s_raw, t.n,
       |    t.n * (t.n - 1) * (2 * t.n + 5) - t.tt AS v18
       |  FROM s JOIN ties t USING (event_type)
       |)
       |SELECT event_type, CAST(n AS BIGINT) AS n,
       |  CAST(s_raw AS BIGINT) AS s_stat,
       |  CAST(v18 AS VARCHAR) AS var18,
       |  CASE WHEN v18 > 0 AND abs(s_raw) > 0 THEN CAST(
       |    (CASE WHEN s_raw < 0 THEN -1 ELSE 1 END)
       |      * ((1000000 * (abs(s_raw) - 1) * $isqrt) // v18) AS BIGINT)
       |  WHEN v18 > 0 THEN 0 END AS z_permicro
       |FROM v""".stripMargin
  }

  def seasonalMkOracleSql: String = {
    val isqrt = Allocation.isqrtDuckSql("(18 * v18)")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
       |  FROM events GROUP BY 1, 2
       |), cells AS (
       |  SELECT event_type, day, cents,
       |    ((day - DATE '1970-01-05') % 7 + 7) % 7 AS sn
       |  FROM daily
       |), s AS (
       |  SELECT a.event_type,
       |    CAST(sum(CASE WHEN b.cents > a.cents THEN 1
       |      WHEN b.cents < a.cents THEN -1 ELSE 0 END) AS HUGEINT) AS s_raw
       |  FROM cells a JOIN cells b
       |    ON a.event_type = b.event_type AND a.sn = b.sn AND a.day < b.day
       |  GROUP BY 1
       |), strat AS (
       |  SELECT event_type, sn, CAST(sum(t) AS HUGEINT) AS ns,
       |    CAST(sum(t * (t - 1) * (2 * t + 5)) AS HUGEINT) AS tts
       |  FROM (SELECT event_type, sn, cents, CAST(count(*) AS HUGEINT) AS t
       |        FROM cells GROUP BY 1, 2, 3)
       |  GROUP BY 1, 2
       |), v AS (
       |  SELECT event_type, CAST(sum(ns) AS HUGEINT) AS n,
       |    CAST(sum(ns * (ns - 1) * (2 * ns + 5) - tts) AS HUGEINT) AS v18
       |  FROM strat GROUP BY 1
       |)
       |SELECT s.event_type, CAST(n AS BIGINT) AS n,
       |  CAST(s_raw AS BIGINT) AS s_stat,
       |  CAST(v18 AS VARCHAR) AS var18,
       |  CASE WHEN v18 > 0 AND abs(s_raw) > 0 THEN CAST(
       |    (CASE WHEN s_raw < 0 THEN -1 ELSE 1 END)
       |      * ((1000000 * (abs(s_raw) - 1) * $isqrt) // v18) AS BIGINT)
       |  WHEN v18 > 0 THEN 0 END AS z_permicro
       |FROM s JOIN v USING (event_type)""".stripMargin
  }

  def friedmanOracleSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
      |  FROM events GROUP BY 1, 2
      |), k AS (SELECT count(DISTINCT event_type) AS k FROM daily),
      |complete AS (
      |  SELECT d.* FROM daily d
      |  JOIN (SELECT day, count(*) AS kb FROM daily GROUP BY 1) c
      |    USING (day)
      |  CROSS JOIN k WHERE c.kb = k.k
      |), ranked AS (
      |  SELECT event_type,
      |    2 * rank() OVER (PARTITION BY day ORDER BY cents)
      |      + count(*) OVER (PARTITION BY day, cents) - 1 AS d
      |  FROM complete
      |), sums AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_blocks,
      |    CAST(sum(d) AS HUGEINT) AS ds
      |  FROM ranked GROUP BY 1
      |)
      |SELECT max(n_blocks) AS n_blocks,
      |  CAST((SELECT k FROM k) AS BIGINT) AS k_treatments,
      |  CAST((3000000 * sum(ds * ds))
      |      // (max(n_blocks) * (SELECT k FROM k)
      |         * ((SELECT k FROM k) + 1))
      |    - 3000000 * max(n_blocks) * ((SELECT k FROM k) + 1)
      |    AS BIGINT) AS chi2_permicro
      |FROM sums""".stripMargin

  def pageOracleSql: String = {
    val k = PageOrder.length
    val posValues = PageOrder.zipWithIndex
      .map { case (t, i) => s"('$t', ${i + 1})" }.mkString(", ")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
       |  FROM events GROUP BY 1, 2
       |), k AS (SELECT count(DISTINCT event_type) AS k FROM daily),
       |complete AS (
       |  SELECT d.* FROM daily d
       |  JOIN (SELECT day, count(*) AS kb FROM daily GROUP BY 1) c
       |    USING (day)
       |  CROSS JOIN k WHERE c.kb = k.k
       |), ranked AS (
       |  SELECT event_type,
       |    2 * rank() OVER (PARTITION BY day ORDER BY cents)
       |      + count(*) OVER (PARTITION BY day, cents) - 1 AS d
       |  FROM complete
       |), sums AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_blocks,
       |    CAST(sum(d) AS BIGINT) AS ds
       |  FROM ranked GROUP BY 1
       |), pos(event_type, j) AS (VALUES $posValues)
       |SELECT max(s.n_blocks) AS n_blocks,
       |  CAST($k AS BIGINT) AS k_treatments,
       |  CAST(sum(p.j * s.ds) AS BIGINT) AS l2_stat,
       |  CAST((max(s.n_blocks) * $k * ($k + 1) * ($k + 1)) // 2 AS BIGINT)
       |    AS e2_null
       |FROM sums s JOIN pos p USING (event_type)""".stripMargin
  }
}
