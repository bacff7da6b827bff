package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Neyman-optimal stratified-sample allocation — how many rows to draw
  * from each stratum when budgeted sampling must minimize estimator
  * variance: n_h ∝ N_h·S_h (Neyman 1934). This is the design step in
  * front of the engine's samplers ([[graft.operators.SeqAugment]]
  * sample_k_per_group, hash_split, submix_sample): a training-data
  * pipeline that downsamples a 100 TB fact into a fixed token budget
  * wants high-variance strata oversampled, and this computes exactly
  * how much. Reference anchor: the stratified pulls feeding
  * /root/reference/MachineLearning/ray_tune_hyperband.py dataset prep.
  *
  * Exactness discipline: N_h·S_h = √(N_h·Σx² − (Σx)²) — the variance
  * numerator SS_h needs no division at all, and its integer square
  * root is computed EXACTLY: a double sqrt seed (off by up to ~50 at
  * 10³⁶ magnitudes from input-rounding alone), two integer Newton
  * steps s ← (s + SS div s) div 2 that crush the seed error
  * quadratically, then a final ±1 clamp certified by comparing s² and
  * (s+1)² against SS — bit-identical on both engines at any magnitude
  * DECIMAL(38,0) holds. Allocations are floor shares of the scaled
  * weight with largest-remainder top-up (the [[Apportion]] Hamilton
  * discipline), so Σ alloc == n_total exactly.
  *
  * Scale: one pass over the fact (groupBy stratum: count/Σx/Σx² with
  * map-side partials), then all math on the STRATA table — bounded by
  * the stratum domain forever.
  */
object Allocation {

  /** Exact integer sqrt of a non-negative DECIMAL(38,0) SQL column
    * expression (emits a nested CASE over Newton iterates). Shared by
    * the rank-correlation family ([[Spearman]]); the DuckDB twin is
    * [[Allocation.isqrtDuckSql]]. */
  private[operators] def isqrtSql(x: String): String = {
    // Spark's `div` ALWAYS returns BIGINT — every iterate must be cast
    // back to DECIMAL(38,0) or the clamp's s² multiply runs (and
    // overflows) in long arithmetic once √x passes ~3·10⁹
    def dec(e: String) = s"CAST($e AS DECIMAL(38,0))"
    val s0 = dec(s"greatest(floor(sqrt(CAST($x AS DOUBLE))), 1.0)")
    val s1 = dec(s"(($s0 + ${dec(s"$x div $s0")}) div 2)")
    val s2 = dec(s"(($s1 + ${dec(s"$x div $s1")}) div 2)")
    s"""(CASE WHEN $x = 0 THEN CAST(0 AS DECIMAL(38,0))
       |  WHEN ($s2 + 1) * ($s2 + 1) <= $x THEN $s2 + 1
       |  WHEN $s2 * $s2 > $x THEN $s2 - 1
       |  ELSE $s2 END)""".stripMargin
  }

  /** Neyman allocation of `nTotal` sample rows across strata of
    * `stratumCol` by the integer metric `valueCol`. Returns
    * (stratum, n_stratum, ss, w_sigma, alloc). */
  def neyman(df: DataFrame, stratumCol: String, valueCol: String,
             nTotal: Long): DataFrame = {
    val strata = df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n_h"),
        sum(col(valueCol).cast("decimal(38,0)")).as("sx"),
        sum(col(valueCol).cast("decimal(38,0)")
          * col(valueCol).cast("decimal(38,0)")).as("sxx"))
      .withColumn("ss", expr("n_h * sxx - sx * sx"))
      .withColumn("__w0", expr(isqrtSql("ss")))
    val wAll = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    // windows over the strata table only (domain-bounded).
    // All-constant strata give Σw = 0 and would divide by zero —
    // Neyman with equal variances REDUCES to proportional allocation,
    // so fall back to w = N_h exactly then
    // NB: "__W0" would silently REPLACE "__w0" — Spark column names
    // are case-insensitive by default
    val shares = strata
      .withColumn("__wsum0", sum(col("__w0")).over(wAll))
      .withColumn("w",
        when(col("__wsum0") === 0, col("n_h")).otherwise(col("__w0")))
      .withColumn("__W", sum(col("w")).over(wAll))
      .withColumn("floor_share", expr(s"($nTotal * w) div __W"))
      .withColumn("rem", expr(s"$nTotal * w - floor_share * __W"))
      .withColumn("__deficit",
        lit(nTotal) - sum(col("floor_share")).over(wAll))
    val wRem = Window.orderBy(col("rem").desc, col("stratum").asc)
    shares
      .withColumn("__r", row_number().over(wRem))
      .select(col("stratum"),
        col("n_h").cast("long").as("n_stratum"),
        col("ss").cast("string").as("ss"),
        col("w").cast("string").as("w_sigma"),
        (col("floor_share") +
          when(col("__r") <= col("__deficit"), 1L).otherwise(0L))
          .cast("long").as("alloc"))
  }

  // ---- query-map entry (hash-gated) ----

  private val SampleBudget = 10000L

  /** Gated instance: allocate a 10k-order sample across order
    * priorities by whole-dollar totalprice variance. */
  def neymanOrders(spark: SparkSession, dir: String): DataFrame =
    neyman(
      Tables.orders(spark, dir).select(
        col("o_orderpriority").as("prio"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100")
          .as("dollars")),
      "prio", "dollars", SampleBudget)
      .select(col("stratum").as("prio"), col("n_stratum"), col("ss"),
        col("w_sigma"), col("alloc"))

  /** DuckDB (HUGEINT) twin of [[isqrtSql]]. */
  private[operators] def isqrtDuckSql(x: String): String = {
    val s0 = s"CAST(greatest(floor(sqrt(CAST($x AS DOUBLE))), 1.0) AS HUGEINT)"
    val s1 = s"(($s0 + $x // $s0) // 2)"
    val s2 = s"(($s1 + $x // $s1) // 2)"
    s"""(CASE WHEN $x = 0 THEN CAST(0 AS HUGEINT)
       |  WHEN ($s2 + 1) * ($s2 + 1) <= $x THEN $s2 + 1
       |  WHEN $s2 * $s2 > $x THEN $s2 - 1
       |  ELSE $s2 END)""".stripMargin
  }

  def oracleSql: String = {
    val isqrt = isqrtDuckSql("ss")
    s"""WITH o AS (
       |  SELECT o_orderpriority AS prio,
       |    CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS dollars
       |  FROM orders
       |), strata AS (
       |  SELECT prio, CAST(count(*) AS HUGEINT) AS n_h,
       |    CAST(sum(dollars) AS HUGEINT) AS sx,
       |    CAST(sum(CAST(dollars AS HUGEINT) * dollars) AS HUGEINT) AS sxx
       |  FROM o GROUP BY prio
       |), withss AS (
       |  SELECT prio, n_h, n_h * sxx - sx * sx AS ss FROM strata
       |), weighted0 AS (
       |  SELECT prio, n_h, ss, $isqrt AS w0 FROM withss
       |), weighted AS (
       |  -- all-constant strata: Neyman degenerates to proportional
       |  SELECT prio, n_h, ss,
       |    CASE WHEN sum(w0) OVER () = 0 THEN n_h ELSE w0 END AS w
       |  FROM weighted0
       |), totW AS (
       |  SELECT prio, n_h, ss, w, sum(w) OVER () AS bigw FROM weighted
       |), floored AS (
       |  SELECT prio, n_h, ss, w, bigw,
       |    ($SampleBudget * w) // bigw AS floor_share,
       |    $SampleBudget * w - (($SampleBudget * w) // bigw) * bigw AS rem
       |  FROM totW
       |), shares AS (
       |  SELECT prio, n_h, ss, w, floor_share, rem,
       |    $SampleBudget - sum(floor_share) OVER () AS deficit
       |  FROM floored
       |)
       |SELECT prio, CAST(n_h AS BIGINT) AS n_stratum,
       |  CAST(ss AS VARCHAR) AS ss, CAST(w AS VARCHAR) AS w_sigma,
       |  CAST(floor_share + (CASE WHEN row_number()
       |      OVER (ORDER BY rem DESC, prio ASC) <= deficit
       |    THEN 1 ELSE 0 END) AS BIGINT) AS alloc
       |FROM shares""".stripMargin
  }
}
