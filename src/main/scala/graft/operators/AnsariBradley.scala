package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Ansari–Bradley two-sample SCALE test — "do the two groups differ in
  * DISPERSION around a common center?": pooled ranks are scored
  * s(p) = min(p, N+1−p) (small at both extremes, large in the middle),
  * so a sample concentrated in the middle scores HIGH and a sample
  * spread to the tails scores LOW. The rank-based complement of
  * [[Robust]]'s Brown–Forsythe (moment-based) and the dispersion
  * sibling of [[MannWhitney]]'s location test — together they separate
  * "shifted" from "fanned out", the drift-triage question a metrics
  * pipeline asks when a distribution moves.
  *
  * Tie handling is EXACT score-mass averaging (the textbook
  * convention): a tied value block occupying pooled positions [l, u]
  * carries total score mass S_b = Σ_{p=l..u} s(p) — closed-form from
  * triangular numbers split at the fold h = (N+1) div 2 — and each
  * member gets S_b/W_b. Averaging the SCORES, not scoring the average
  * rank: the two differ whenever a block straddles the fold (s is
  * non-monotone), which midrank shortcuts get wrong.
  *
  * Exactness at 10¹² pooled rows: triangular numbers T(x) = x(x+1)/2
  * use the even-factor-halving form (a `div 2` QUOTIENT would outgrow
  * BIGINT — Spark's div always returns long); the per-block statistic
  * contribution (10⁶·w_g·S_b)/W_b is decomposed so every div quotient
  * stays ≤ 10¹²: μ = S_b div W_b (≤ (N+1)/2), then carries of
  * (w_g·(S_b % W_b)) div W_b (≤ w_g) and a final permicro remainder —
  * an exact floor-decomposition identity of the direct form, truncated
  * once per block, identically in both engines (DuckDB mirrors the
  * staging verbatim: the direct 10⁶-scaled product passes 10⁴² and
  * overflows HUGEINT too). ab/exp micros report as digit strings
  * (their magnitude ≤ 10²⁹ outgrows BIGINT; [[Kendall]]'s VARCHAR
  * convention).
  *
  * Scale: one fact pass to (value, per-group counts) cells; the
  * position walk is a window over the DOMAIN-bounded cell table;
  * everything after is cell-sized.
  */
object AnsariBradley {

  private def dec(e: String) = s"CAST($e AS DECIMAL(38,0))"
  /** Exact T(x) = x(x+1)/2 with the even factor halved BEFORE the
    * multiply (both engines; x a simple column reference). */
  private def tri(x: String) =
    s"""(CASE WHEN ($x) % 2 = 0
       |  THEN ${dec(s"($x) div 2")} * (($x) + 1)
       |  ELSE ($x) * ${dec(s"(($x) + 1) div 2")} END)""".stripMargin
  private def triDuck(x: String) = s"((($x) * (($x) + 1)) // 2)"

  /** Exact Σ_b 10⁶·(g·s)/w as (quotient-bounded) staged floors:
    * 10⁶·(g·(s div w) + (g·(s%w)) div w) + (10⁶·((g·(s%w)) % w)) div w.
    * Emits a per-row term to be summed. */
  private def stagedMicro(g: String, s: String, w: String) =
    s"""(CAST(1000000 AS DECIMAL(38,0))
       |   * (($g) * ${dec(s"($s) div ($w)")}
       |      + ${dec(s"(($g) * (($s) % ($w))) div ($w)")})
       | + ${dec(s"(1000000 * ((($g) * (($s) % ($w))) % ($w))) div ($w)")})"""
      .stripMargin.replaceAll("\n", "")
  private def stagedMicroDuck(g: String, s: String, w: String) =
    s"""(CAST(1000000 AS HUGEINT)
       |   * (($g) * (($s) // ($w)) + (($g) * (($s) % ($w))) // ($w))
       | + (1000000 * ((($g) * (($s) % ($w))) % ($w))) // ($w))"""
      .stripMargin.replaceAll("\n", "")

  /** Per-group rows (grp, n_obs, ab_micro, exp_micro) over exactly two
    * groups in `groupCol`. ab_micro is the 10⁶-scaled Ansari–Bradley
    * statistic with exact tie score-mass averaging; exp_micro its null
    * expectation n_g·S_N/N. Both as digit strings. */
  def abStats(df: DataFrame, valueCol: String, groupCol: String,
              g1: String, g2: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df
      .filter(col(groupCol).isin(g1, g2))
      .groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).cast(d38).as("w"),
        sum(when(col(groupCol) === g1, 1L).otherwise(0L))
          .cast(d38).as("w1"))
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val scored = cells
      .withColumn("u", sum("w").over(wCum).cast(d38))
      .withColumn("bigN", sum("w").over(wAll).cast(d38))
      .withColumn("l", (col("u") - col("w") + 1).cast(d38))
      .withColumn("h", expr(dec("(bigN + 1) div 2")))
      .withColumn("m1", expr("least(u, h)"))
      .withColumn("g1b", expr("greatest(l, h + 1)"))
      .withColumn("s_b", expr(
        s"""CAST(CASE WHEN l <= m1
              THEN ${tri("m1")} - ${tri("l - 1")} ELSE 0 END AS DECIMAL(38,0))
            + CAST(CASE WHEN g1b <= u
              THEN (u - g1b + 1) * (bigN + 1)
                   - (${tri("u")} - ${tri("g1b - 1")})
              ELSE 0 END AS DECIMAL(38,0))"""))
      .localCheckpoint() // consumed once per group readout
    def groupStat(wg: String, label: String) = scored
      .agg(
        sum(expr(wg)).cast("long").as("n_obs"),
        sum(expr(stagedMicro(wg, "s_b", "w"))).cast(d38).as("__ab"),
        max(col("bigN")).as("__N"),
        sum(col("s_b")).cast(d38).as("__sn"))
      .select(lit(label).as("grp"), col("n_obs"),
        col("__ab").cast("string").as("ab_micro"),
        expr(stagedMicro(dec("n_obs"), "__sn", "__N"))
          .cast("string").as("exp_micro"))
    groupStat("w1", g1).unionByName(groupStat("(w - w1)", g2))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: do returned (R) and receipt-clean (N) line items
    * differ in quantity DISPERSION? Massive ties (quantity ∈ 1..50)
    * exercise the exact block-mass path. */
  def abLineitem(spark: SparkSession, dir: String): DataFrame =
    abStats(
      Tables.lineitem(spark, dir).select(col("l_returnflag"),
        round(col("l_quantity")).cast("long").as("q")),
      "q", "l_returnflag", "R", "N")

  def oracleSql: String = {
    def grp(wg: String, label: String) =
      s"""SELECT '$label' AS grp, CAST(sum($wg) AS BIGINT) AS n_obs,
         |  CAST(sum(${stagedMicroDuck(wg, "s_b", "w")}) AS VARCHAR)
         |    AS ab_micro,
         |  CAST(${stagedMicroDuck("sum(" + wg + ")", "sum(s_b)", "max(bigN)")}
         |    AS VARCHAR) AS exp_micro
         |FROM scored""".stripMargin
    s"""WITH obs AS (
       |  SELECT CAST(round(l_quantity) AS BIGINT) AS v, l_returnflag AS g
       |  FROM lineitem WHERE l_returnflag IN ('R', 'N')
       |), cells AS (
       |  SELECT v, CAST(count(*) AS HUGEINT) AS w,
       |    CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS HUGEINT) AS w1
       |  FROM obs GROUP BY v
       |), pos AS (
       |  SELECT v, w, w1,
       |    sum(w) OVER (ORDER BY v
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS u,
       |    sum(w) OVER () AS bigN
       |  FROM cells
       |), folded AS (
       |  SELECT *, least(u, h) AS m1, greatest(l, h + 1) AS g1b
       |  FROM (SELECT *, u - w + 1 AS l, (bigN + 1) // 2 AS h FROM pos)
       |), scored AS (
       |  SELECT v, w, w1, u, bigN,
       |    (CASE WHEN l <= m1
       |       THEN ${triDuck("m1")} - ${triDuck("l - 1")} ELSE 0 END)
       |    + (CASE WHEN g1b <= u
       |       THEN (u - g1b + 1) * (bigN + 1)
       |            - (${triDuck("u")} - ${triDuck("g1b - 1")})
       |       ELSE 0 END) AS s_b
       |  FROM folded
       |)
       |${grp("w1", "R")}
       |UNION ALL
       |${grp("(w - w1)", "N")}""".stripMargin
  }
}
