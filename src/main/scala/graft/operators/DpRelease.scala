package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Hll

/** Seeded discrete-Laplace (two-sided geometric) count release — the
  * MECHANISM layer of differential privacy next to [[KAnonymity]]'s
  * structural audit: each released count is n + Z where Z follows the
  * discrete Laplace with parameter α = e^(−ε/Δ) (ε = 1, sensitivity
  * Δ = 1 for counting queries). Production DP systems pin the noise
  * seed for reproducible releases and tests; here the draw is the
  * inverse-CDF of a ppm-uniform from the repo's validated xorshift
  * mixer over the GROUP KEY — deterministic, engine-identical, and
  * every release of the same group draws the same noise (so repeated
  * queries cannot average the noise away, the memoized-noise
  * discipline). The privacy column a curated export publishes
  * (the reference's medallion exports; k_anonymity says what not to
  * release, this is HOW to release the rest).
  *
  * The CDF is a PRECOMPUTED ±15-step ppm table (covers 1−6e-7 of the
  * mass at ε=1; tail draws clamp — declared), embedded as the same
  * literals in both engines: no RNG, no libm at query time. One
  * aggregate to group cardinality; noise attachment is O(groups).
  *
  * SECRECY CAVEAT (what the determinism costs): the noise is a
  * function of (group key ⊕ seed) through the mixer. With a PUBLIC or
  * default seed the draw is recomputable by any consumer — the release
  * is then a reproducibility/plumbing demonstration, NOT a privacy
  * guarantee, because n = n_noisy − z is recoverable. Memoized-noise
  * DP systems get both properties by keeping the seed SECRET: pass a
  * caller-supplied secret `seed` and the release is ε-DP against
  * everyone who doesn't hold it, while staying reproducible for the
  * publisher. The GATED instance uses the default seed precisely so
  * the DuckDB oracle can recompute it — it demonstrates the mechanism,
  * and this caveat is the honest label on that choice.
  */
object DpRelease {
  val EpsilonMicro = 1000000L // ε = 1, documented in the release
  /** P(Z ≤ k) in ppm for k = −15..15, discrete Laplace α = e⁻¹. */
  val CumPpm: Seq[(Long, Long)] = {
    val alpha = math.exp(-1.0)
    val p0 = (1 - alpha) / (1 + alpha)
    // P(Z = k) = p0·α^|k|; cumulative from the left
    val ks = (-15 to 15).map(_.toLong)
    var cum = 0.0
    // mass below −15 (clamped into k = −15's bucket)
    cum = p0 * math.pow(alpha, 16) / (1 - alpha)
    ks.map { k =>
      cum += p0 * math.pow(alpha, math.abs(k).toDouble)
      (k, math.min(1000000L, math.round(cum * 1e6)))
    }
  }

  /** Noisy counts per group of `keyCol`: (group, n_noisy, epsilon_micro).
    * The noise key is (group value ⊕ `seed`) — same group, same seed,
    * same noise, forever (memoized-noise discipline). `seed` must be
    * SECRET for the release to carry privacy (see the object caveat);
    * the default 0 is the oracle-recomputable demo configuration. */
  def noisyCounts(df: DataFrame, keyCol: String, seed: Long = 0L): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("long").as("grp"))
      .agg(count(lit(1)).as("n"))
      // (group key ⊕ seed) → codegen'd mixer → uniform ppm
      .withColumn("u", graft.functions.Native.call("graft_mix_mod61",
        exprs => graft.functions.MixMod61(exprs.head),
        col("grp").bitwiseXOR(lit(seed)))
        % lit(1000000L))
      // inverse CDF: smallest k with u < cum(k) == −15 + #{k: cum(k) ≤ u}
      .withColumn("z", CumPpm.foldLeft(lit(-15L)) {
        case (acc, (_, c)) => acc + when(col("u") >= c, 1L).otherwise(0L) })
    counts.select(col("grp"), (col("n") + col("z")).as("n_noisy"),
      lit(EpsilonMicro).as("epsilon_micro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: DP release of customers-per-nation. */
  def dpCustomerCounts(spark: SparkSession, dir: String): DataFrame =
    noisyCounts(Tables.customer(spark, dir).select(col("c_nationkey")),
      "c_nationkey")

  def oracleSql: String = {
    val steps = CumPpm.map { case (_, c) => s"(CASE WHEN u >= $c THEN 1 ELSE 0 END)" }
      .mkString(" + ")
    s"""WITH counts AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS grp,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM customer GROUP BY 1
      |), h1s AS (
      |  SELECT grp, n, CAST((CAST(${Hll.A} AS HUGEINT) * grp + ${Hll.B})
      |    % ${Hll.P} AS BIGINT) AS h1
      |  FROM counts
      |), h2s AS (
      |  SELECT grp, n, CAST((CAST(${Hll.A2} AS HUGEINT) * xor(h1, h1 >> 30))
      |    % ${Hll.P} AS BIGINT) AS h2
      |  FROM h1s
      |), uni AS (
      |  SELECT grp, n, xor(h2, h2 >> 27) % 1000000 AS u FROM h2s
      |)
      |SELECT grp, CAST(n + (-15 + $steps) AS BIGINT) AS n_noisy,
      |  CAST($EpsilonMicro AS BIGINT) AS epsilon_micro
      |FROM uni""".stripMargin
  }
}
