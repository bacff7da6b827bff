package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Experiment design + panel inference pair beside the A/B readout
  * family ([[Bootstrap]], [[Cuped]], [[SrmCheck]], [[MannWhitney]]):
  *
  * - **power_mde**: minimum detectable effect for a two-sample mean
  *   test at α=5% (two-sided) / 80% power, per arm definition —
  *   THE sizing question asked before any experiment ships. With
  *   population variance σ² = SS/n² (SS = n·Σx²−(Σx)², no division),
  *   MDE = (z_{α/2}+z_β)·σ·√(2/n) = Z·isqrt((2·SS) div n) div n —
  *   one staged truncating div after [[Allocation]]'s exact isqrt;
  *   z sum embedded as the public permicro constant 1959964+841621.
  * - **diff_in_diff**: the 2×2 panel estimator
  *   (treated − control) × (post − pre) on exact cell means —
  *   conversion-window causal readout when randomization is broken.
  *   Each cell mean reports in sign-split truncating micros; the DiD
  *   combines the four DECLARED truncated means, so the contract is
  *   bit-identical cross-engine (error < 4 micros of the metric).
  *
  * Reference anchor: experiment scoreboards over the event stream
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py) and
  * the tuning-budget sizing in
  * /root/reference/MachineLearning/ray_tune_hyperband.py.
  * Both are one fact pass into conditional partial aggregates; all
  * post-aggregation math runs on arm/cell-sized frames.
  */
object ExperimentDesign {

  /** z_{0.025} + z_{0.20} in permicro — standard normal quantiles for
    * the 5%-two-sided / 80%-power design (public constants). */
  val ZSumPermicro = 1959964L + 841621L

  /** Per-arm MDE rows (arm, n, ss, mde_micros) for integer metric
    * `valueCol` grouped by `armCol`. MDE = Z·√(2·SS)/(√n·n) with BOTH
    * roots taken separately through the exact isqrt — the single-root
    * form isqrt((2·SS) div n) has a div whose quotient ≈ 2nσ² outgrows
    * BIGINT near 10⁹ rows (Spark's div returns long), the overflow
    * class this family bans. Split-isqrt truncation overestimates by
    * ≤ (1/√(2SS) + 1/√n) relative — negligible at any real arm size. */
  def powerMde(df: DataFrame, armCol: String, valueCol: String): DataFrame = {
    val arms = df.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col(valueCol).cast("decimal(38,0)")).as("sx"),
        sum(col(valueCol).cast("decimal(38,0)")
          * col(valueCol).cast("decimal(38,0)")).as("sxx"))
      .withColumn("ss", expr("n * sxx - sx * sx"))
    val s1 = Allocation.isqrtSql("(2 * ss)")
    val s2 = Allocation.isqrtSql("n")
    arms.select(col("arm"), col("n").cast("long").as("n"),
      col("ss").cast("string").as("ss"),
      expr(s"CAST(($ZSumPermicro * $s1) div ($s2 * n) AS BIGINT)")
        .as("mde_micros"))
  }

  /** One-row 2×2 DiD panel: per-cell counts and truncated micro means
    * plus the combined estimate. */
  def diffInDiff(df: DataFrame, treatedCol: String, postCol: String,
                 valueCol: String): DataFrame = {
    def cell(t: Boolean, p: Boolean, what: String) = {
      val in = col(treatedCol) === t && col(postCol) === p
      val n = sum(when(in, 1L).otherwise(0L))
      val sv = sum(when(in, col(valueCol)).otherwise(lit(0L))
        .cast("decimal(38,0)"))
      (n.as(s"n_$what"), sv.as(s"__s_$what"))
    }
    val (nTPre, sTPre) = cell(t = true, p = false, "t_pre")
    val (nTPost, sTPost) = cell(t = true, p = true, "t_post")
    val (nCPre, sCPre) = cell(t = false, p = false, "c_pre")
    val (nCPost, sCPost) = cell(t = false, p = true, "c_post")
    def mean(what: String): String =
      s"""CASE WHEN n_$what > 0 THEN
         |  (CASE WHEN __s_$what < 0 THEN -1 ELSE 1 END)
         |    * ((1000000 * abs(__s_$what)) div n_$what) END""".stripMargin
    df.agg(nTPre, sTPre, nTPost, sTPost, nCPre, sCPre, nCPost, sCPost)
      .select(
        col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
        expr(s"CAST(${mean("t_pre")} AS BIGINT)").as("mean_t_pre_micros"),
        expr(s"CAST(${mean("t_post")} AS BIGINT)").as("mean_t_post_micros"),
        expr(s"CAST(${mean("c_pre")} AS BIGINT)").as("mean_c_pre_micros"),
        expr(s"CAST(${mean("c_post")} AS BIGINT)").as("mean_c_post_micros"))
      .withColumn("did_micros",
        (col("mean_t_post_micros") - col("mean_t_pre_micros"))
          - (col("mean_c_post_micros") - col("mean_c_pre_micros")))
  }

  // ---- query-map entries (hash-gated) ----

  /** Gated MDE instance: whole-dollar order totalprice per priority
    * arm — "how small an average-order-value lift could each arm
    * detect at its current traffic". */
  def powerMdeOrders(spark: SparkSession, dir: String): DataFrame =
    powerMde(
      Tables.orders(spark, dir).select(
        col("o_orderpriority").as("prio"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100")
          .as("dollars")),
      "prio", "dollars")
      .select(col("arm").as("prio"), col("n"), col("ss"), col("mde_micros"))

  def powerMdeOracleSql: String = {
    val s1 = Allocation.isqrtDuckSql("(2 * ss)")
    val s2 = Allocation.isqrtDuckSql("n")
    s"""WITH o AS (
       |  SELECT o_orderpriority AS prio,
       |    CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS dollars
       |  FROM orders
       |), arms AS (
       |  SELECT prio, CAST(count(*) AS HUGEINT) AS n,
       |    CAST(sum(dollars) AS HUGEINT) AS sx,
       |    CAST(sum(CAST(dollars AS HUGEINT) * dollars) AS HUGEINT) AS sxx
       |  FROM o GROUP BY prio
       |), withss AS (
       |  SELECT prio, n, n * sxx - sx * sx AS ss FROM arms
       |)
       |SELECT prio, CAST(n AS BIGINT) AS n, CAST(ss AS VARCHAR) AS ss,
       |  CAST(($ZSumPermicro * $s1) // ($s2 * n) AS BIGINT) AS mde_micros
       |FROM withss""".stripMargin
  }

  /** Gated DiD instance over events: treated = even user_id, post =
    * the second half of the observed calendar window (split at the
    * midpoint of min/max event date), metric = value in cents. */
  def didEvents(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(
      (col("user_id") % 2 === 0).as("treated"),
      col("ts").cast("date").as("day"),
      round(col("value") * 100).cast("long").as("cents"))
    val bounds = e.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    val withPost = e.crossJoin(broadcast(bounds))
      .withColumn("post",
        datediff(col("day"), col("__d0"))
          > expr("datediff(__d1, __d0) div 2"))
    diffInDiff(withPost, "treated", "post", "cents")
  }

  def didOracleSql: String = {
    def mean(w: String) =
      s"""CASE WHEN n_$w > 0 THEN
         |  (CASE WHEN s_$w < 0 THEN -1 ELSE 1 END)
         |    * ((1000000 * abs(s_$w)) // n_$w) END""".stripMargin
    s"""WITH e AS (
       |  SELECT user_id % 2 = 0 AS treated, CAST(ts AS DATE) AS day,
       |    CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events
       |), b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
       |p AS (
       |  SELECT treated,
       |    date_diff('day', b.d0, day)
       |      > date_diff('day', b.d0, b.d1) // 2 AS post,
       |    cents
       |  FROM e CROSS JOIN b
       |), cells AS (
       |  SELECT
       |    CAST(sum(CASE WHEN treated AND NOT post THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_t_pre,
       |    CAST(sum(CASE WHEN treated AND post THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_t_post,
       |    CAST(sum(CASE WHEN NOT treated AND NOT post THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_c_pre,
       |    CAST(sum(CASE WHEN NOT treated AND post THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_c_post,
       |    CAST(sum(CASE WHEN treated AND NOT post THEN cents ELSE 0 END)
       |      AS HUGEINT) AS s_t_pre,
       |    CAST(sum(CASE WHEN treated AND post THEN cents ELSE 0 END)
       |      AS HUGEINT) AS s_t_post,
       |    CAST(sum(CASE WHEN NOT treated AND NOT post THEN cents ELSE 0 END)
       |      AS HUGEINT) AS s_c_pre,
       |    CAST(sum(CASE WHEN NOT treated AND post THEN cents ELSE 0 END)
       |      AS HUGEINT) AS s_c_post
       |  FROM p
       |), m AS (
       |  SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
       |    CAST(${mean("t_pre")} AS BIGINT) AS mean_t_pre_micros,
       |    CAST(${mean("t_post")} AS BIGINT) AS mean_t_post_micros,
       |    CAST(${mean("c_pre")} AS BIGINT) AS mean_c_pre_micros,
       |    CAST(${mean("c_post")} AS BIGINT) AS mean_c_post_micros
       |  FROM cells
       |)
       |SELECT *, (mean_t_post_micros - mean_t_pre_micros)
       |  - (mean_c_post_micros - mean_c_pre_micros) AS did_micros
       |FROM m""".stripMargin
  }
}
