package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Hll

/** Poisson bootstrap confidence interval for a mean — THE bootstrap
  * that distributes: classical resampling needs n draws coordinated
  * across the cluster, Poisson bootstrap gives every row an
  * INDEPENDENT Poisson(1) replicate weight, so B replicates are one
  * map-side explode + one aggregate (Chamandy et al., "Estimating
  * uncertainty for massive data streams", the method behind
  * large-scale experiment CIs; the uncertainty readout for
  * /root/reference/MachineLearning/Kubernetes/src/stats_forecast_tune.py-
  * style evaluation at data sizes where one machine cannot resample).
  *
  * Determinism discipline: the Poisson(1) draw is the inverse-CDF of a
  * ppm-uniform from the repo's validated two-round xorshift hash
  * ([[Hll]]'s mixer over key·64+replicate), against a PRECOMPUTED
  * cumulative-Poisson ppm table embedded as the same literals in both
  * engines — no RNG, no libm at query time, rerun-identical anywhere.
  * Replicate means are exact truncating-division micros; the CI is the
  * (⌈q(B+1)⌉ clamped) order statistic of the B means — all on a B-row
  * frame.
  */
object Bootstrap {
  val B = 32 // replicates
  /** P(Poisson(1) ≤ k) in ppm for k = 0..8; weight caps at 9. */
  val PoissonCumPpm: Seq[Long] = {
    var term = BigDecimal(1); var cum = BigDecimal(0)
    (0 to 8).map { k =>
      if (k > 0) term = term / k
      cum += term
      // cum holds Σ 1/i! ; multiply by e⁻¹ at the end of each step
      (cum * BigDecimal(math.exp(-1.0)) * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
  }

  /** One row: (n, b_reps, mean_micro, ci_lo_micro, ci_hi_micro) — the
    * full-sample mean of `valueCol` (integer units → micros) with the
    * 2.5%/97.5% percentile-bootstrap bounds from B Poisson replicates
    * keyed by `idCol`. */
  def meanCi(df: DataFrame, idCol: String, valueCol: String): DataFrame = {
    val reps = df.select(col(idCol).cast("long").as("i"),
        col(valueCol).cast("long").as("x"))
      .withColumn("b", explode(expr(s"sequence(1, $B)")))
      // (i,b) → codegen'd mixer → uniform ppm → inverse-CDF weight
      .withColumn("u", graft.functions.Native.call("graft_mix_mod61",
        exprs => graft.functions.MixMod61(exprs.head),
        col("i") * lit(64L) + col("b")) % lit(1000000L))
      .withColumn("w", PoissonCumPpm.foldLeft(lit(0L)) {
        case (acc, t) => acc + when(col("u") >= t, 1L).otherwise(0L) })
    val means = reps.groupBy(col("b"))
      .agg(sum(col("w") * col("x")).cast("decimal(38,0)").as("swx"),
        sum(col("w")).as("sw"))
      // a replicate with all-zero weights (impossible beyond toy n) → NULL
      .select(expr("CASE WHEN sw > 0 THEN (1000000 * swx) div sw END").as("m"))
    val kLo = math.max(1, math.ceil(0.025 * (B + 1)).toInt)
    val kHi = math.min(B, math.ceil(0.975 * (B + 1)).toInt)
    val ci = means.agg(
      sort_array(collect_list(col("m"))).as("ms"))
      .select(element_at(col("ms"), kLo).as("ci_lo_micro"),
        element_at(col("ms"), kHi).as("ci_hi_micro"))
    val full = df.agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(38,0)")).as("sx"))
      .select(col("n"), expr("CASE WHEN n > 0 THEN (1000000 * sx) div n END")
        .as("mean_micro"))
    full.crossJoin(broadcast(ci))
      .select(col("n"), lit(B).as("b_reps"), col("mean_micro"),
        col("ci_lo_micro"), col("ci_hi_micro"))
  }

  /** Poisson-bootstrap CI for a DIFFERENCE of means between two arms —
    * the A/B readout: per replicate, each arm's truncating-micros mean
    * is computed independently (weights drawn per (unit, replicate) by
    * the same mixer + table) and the replicate statistic is their
    * difference; CI = the same clamped order statistics over B. One
    * row: (n1, n2, diff_micro, ci_lo_micro, ci_hi_micro). */
  def diffCi(df: DataFrame, idCol: String, valueCol: String,
             armCol: String, g1: String, g2: String): DataFrame = {
    val base = df
      .filter(col(armCol) === g1 || col(armCol) === g2)
      .select(col(idCol).cast("long").as("i"),
        col(valueCol).cast("long").as("x"),
        (col(armCol) === g1).as("a1"))
      .localCheckpoint() // consumed by the replicate AND full-sample pass
    val reps = base
      .withColumn("b", explode(expr(s"sequence(1, $B)")))
      .withColumn("u", graft.functions.Native.call("graft_mix_mod61",
        exprs => graft.functions.MixMod61(exprs.head),
        col("i") * lit(64L) + col("b")) % lit(1000000L))
      .withColumn("w", PoissonCumPpm.foldLeft(lit(0L)) {
        case (acc, t) => acc + when(col("u") >= t, 1L).otherwise(0L) })
    val diffs = reps.groupBy(col("b"))
      .agg(
        sum(when(col("a1"), col("w")).otherwise(0L)).as("sw1"),
        sum(when(col("a1"), col("w") * col("x")).otherwise(0L))
          .cast("decimal(38,0)").as("swx1"),
        sum(when(col("a1"), 0L).otherwise(col("w"))).as("sw2"),
        sum(when(col("a1"), 0L).otherwise(col("w") * col("x")))
          .cast("decimal(38,0)").as("swx2"))
      .select(expr("""CASE WHEN sw1 > 0 AND sw2 > 0 THEN
          (CASE WHEN swx1 < 0 THEN -1L ELSE 1L END)
            * ((1000000 * abs(swx1)) div sw1)
          - (CASE WHEN swx2 < 0 THEN -1L ELSE 1L END)
            * ((1000000 * abs(swx2)) div sw2) END""").as("m"))
    val kLo = math.max(1, math.ceil(0.025 * (B + 1)).toInt)
    val kHi = math.min(B, math.ceil(0.975 * (B + 1)).toInt)
    val ci = diffs.agg(sort_array(collect_list(col("m"))).as("ms"))
      .select(element_at(col("ms"), kLo).as("ci_lo_micro"),
        element_at(col("ms"), kHi).as("ci_hi_micro"))
    val full = base.agg(
        sum(when(col("a1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("a1"), col("x")).otherwise(0L))
          .cast("decimal(38,0)").as("sx1"),
        sum(when(col("a1"), 0L).otherwise(1L)).as("n2"),
        sum(when(col("a1"), 0L).otherwise(col("x")))
          .cast("decimal(38,0)").as("sx2"))
      .select(col("n1"), col("n2"),
        expr("""CASE WHEN n1 > 0 AND n2 > 0 THEN
            (CASE WHEN sx1 < 0 THEN -1L ELSE 1L END)
              * ((1000000 * abs(sx1)) div n1)
            - (CASE WHEN sx2 < 0 THEN -1L ELSE 1L END)
              * ((1000000 * abs(sx2)) div n2) END""").as("diff_micro"))
    full.crossJoin(broadcast(ci))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: CI for mean order totalprice (cents). */
  def bootstrapOrders(spark: SparkSession, dir: String): DataFrame =
    meanCi(Tables.orders(spark, dir).select(col("o_orderkey"),
      round(col("o_totalprice") * 100).cast("long").as("cents")),
      "o_orderkey", "cents")

  def oracleSql: String = {
    val kLo = math.max(1, math.ceil(0.025 * (B + 1)).toInt)
    val kHi = math.min(B, math.ceil(0.975 * (B + 1)).toInt)
    val thresholds = PoissonCumPpm.map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH rows_b AS (
      |  SELECT o_orderkey AS i, CAST(round(o_totalprice * 100) AS BIGINT) AS x,
      |    b FROM orders CROSS JOIN (SELECT unnest(range(1, ${B + 1})) AS b)
      |), hashed AS (
      |  SELECT x, b,
      |    CAST((CAST(${Hll.A} AS HUGEINT) * (i * 64 + b) + ${Hll.B}) % ${Hll.P}
      |      AS BIGINT) AS h1
      |  FROM rows_b
      |), mixed AS (
      |  SELECT x, b,
      |    CAST((CAST(${Hll.A2} AS HUGEINT) * xor(h1, h1 >> 30)) % ${Hll.P}
      |      AS BIGINT) AS h2
      |  FROM hashed
      |), uni AS (
      |  SELECT x, b, xor(h2, h2 >> 27) % 1000000 AS u FROM mixed
      |), weighted AS (
      |  SELECT x, b, $thresholds AS w FROM uni
      |), means AS (
      |  SELECT b,
      |    CASE WHEN sum(w) > 0 THEN
      |      CAST((1000000 * CAST(sum(CAST(w AS HUGEINT) * x) AS HUGEINT))
      |        // CAST(sum(w) AS HUGEINT) AS BIGINT) END AS m
      |  FROM weighted GROUP BY 1
      |), ordered AS (
      |  SELECT m, row_number() OVER (ORDER BY m) AS rk FROM means
      |), ci AS (
      |  SELECT CAST(max(CASE WHEN rk = $kLo THEN m END) AS BIGINT) AS ci_lo_micro,
      |    CAST(max(CASE WHEN rk = $kHi THEN m END) AS BIGINT) AS ci_hi_micro
      |  FROM ordered
      |), full_s AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CASE WHEN count(*) > 0 THEN
      |      CAST((1000000 * CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |        AS HUGEINT)) // count(*) AS BIGINT) END AS mean_micro
      |  FROM orders
      |)
      |SELECT f.n, $B AS b_reps, f.mean_micro, c.ci_lo_micro, c.ci_hi_micro
      |FROM full_s f CROSS JOIN ci c""".stripMargin
  }

  /** Gated A/B instance: lineitem quantity, returned ('R') vs
    * never-returned ('N') arms keyed by line identity. */
  def bootstrapAbLineitem(spark: SparkSession, dir: String): DataFrame =
    diffCi(Tables.lineitem(spark, dir).select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("lid"),
      round(col("l_quantity")).cast("long").as("q"),
      col("l_returnflag").as("flag")),
      "lid", "q", "flag", "R", "N")

  def abOracleSql: String = {
    val kLo = math.max(1, math.ceil(0.025 * (B + 1)).toInt)
    val kHi = math.min(B, math.ceil(0.975 * (B + 1)).toInt)
    val thresholds = PoissonCumPpm.map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH base AS (
      |  SELECT l_orderkey * 10 + l_linenumber AS i,
      |    CAST(round(l_quantity) AS BIGINT) AS x,
      |    l_returnflag = 'R' AS a1
      |  FROM lineitem WHERE l_returnflag IN ('R', 'N')
      |), rows_b AS (
      |  SELECT i, x, a1, b
      |  FROM base CROSS JOIN (SELECT unnest(range(1, ${B + 1})) AS b)
      |), hashed AS (
      |  SELECT x, a1, b,
      |    CAST((CAST(${Hll.A} AS HUGEINT) * (i * 64 + b) + ${Hll.B}) % ${Hll.P}
      |      AS BIGINT) AS h1
      |  FROM rows_b
      |), mixed AS (
      |  SELECT x, a1, b,
      |    CAST((CAST(${Hll.A2} AS HUGEINT) * xor(h1, h1 >> 30)) % ${Hll.P}
      |      AS BIGINT) AS h2
      |  FROM hashed
      |), uni AS (
      |  SELECT x, a1, b, xor(h2, h2 >> 27) % 1000000 AS u FROM mixed
      |), weighted AS (
      |  SELECT x, a1, b, $thresholds AS w FROM uni
      |), diffs AS (
      |  SELECT b,
      |    CASE WHEN sum(CASE WHEN a1 THEN w ELSE 0 END) > 0
      |          AND sum(CASE WHEN a1 THEN 0 ELSE w END) > 0 THEN
      |      CAST((1000000 * CAST(sum(CASE WHEN a1 THEN CAST(w AS HUGEINT) * x
      |          ELSE 0 END) AS HUGEINT))
      |        // CAST(sum(CASE WHEN a1 THEN w ELSE 0 END) AS HUGEINT) AS BIGINT)
      |      - CAST((1000000 * CAST(sum(CASE WHEN a1 THEN 0
      |          ELSE CAST(w AS HUGEINT) * x END) AS HUGEINT))
      |        // CAST(sum(CASE WHEN a1 THEN 0 ELSE w END) AS HUGEINT) AS BIGINT)
      |    END AS m
      |  FROM weighted GROUP BY 1
      |), ordered AS (
      |  SELECT m, row_number() OVER (ORDER BY m) AS rk FROM diffs
      |), ci AS (
      |  SELECT CAST(max(CASE WHEN rk = $kLo THEN m END) AS BIGINT) AS ci_lo_micro,
      |    CAST(max(CASE WHEN rk = $kHi THEN m END) AS BIGINT) AS ci_hi_micro
      |  FROM ordered
      |), full_s AS (
      |  SELECT CAST(sum(CASE WHEN a1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN a1 THEN 0 ELSE 1 END) AS BIGINT) AS n2,
      |    CAST((1000000 * CAST(sum(CASE WHEN a1 THEN x ELSE 0 END) AS HUGEINT))
      |        // sum(CASE WHEN a1 THEN 1 ELSE 0 END) AS BIGINT)
      |    - CAST((1000000 * CAST(sum(CASE WHEN a1 THEN 0 ELSE x END) AS HUGEINT))
      |        // sum(CASE WHEN a1 THEN 0 ELSE 1 END) AS BIGINT) AS diff_micro
      |  FROM base
      |)
      |SELECT f.n1, f.n2, f.diff_micro, c.ci_lo_micro, c.ci_hi_micro
      |FROM full_s f CROSS JOIN ci c""".stripMargin
  }
}
