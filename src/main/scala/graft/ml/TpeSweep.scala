package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tree-structured-Parzen-Estimator proposal step — the model-based
  * search half of the reference's tune loop (ray.tune HyperOptSearch
  * next to the ASHAScheduler: /root/reference/MachineLearning/
  * Kubernetes/src/neural_forecast_tune.py:6,10 and the same pair in
  * Ray/tabular/tune.py): after a sweep completes, split the observed
  * trials into a GOOD quantile and the rest, model each side's density
  * over the search dimension, and propose the candidate maximizing
  * l(x)/g(x) (Bergstra et al. 2011, "Algorithms for Hyper-Parameter
  * Optimization") — the argmax of expected improvement under the
  * two-density model.
  *
  * Exact-integer re-expression: each trial's OBSERVED accuracy is the
  * deepest rung it was actually evaluated at before ASHA killed it
  * (killed at rung r ⇒ acc_r; the survivor reads acc_3) — the trial
  * table a real scheduler hands its searcher. Densities are triangular
  * kernel COUNTS, good_density(c) = Σ_good max(0, W − |c − t|), an
  * integer; the proposal score is (10⁶·(good+1)) div (bad+1) —
  * truncating ratio of integers, Laplace-smoothed so empty densities
  * stay ordered — and the argmax is total-ordered by (score desc,
  * candidate asc). The gated output is the whole scored candidate
  * table with a `proposed` flag, the way gbt_stump gates the tree
  * STEP rather than a converged loop.
  *
  * Scale: trials and candidates are grid-bounded (16 × 64 here); the
  * only corpus-sized work is the sweep that produced the trial table.
  * The density join is a bounded cross join over broadcast frames.
  */
object TpeSweep {

  val Gamma = 4        // |good| — top quantile of the 16 trials
  val BandW = 40000L   // triangular kernel half-width (2 grid steps)
  val CandN = 64       // candidate grid size
  val CandLo = 55000L  // candidate grid: 55000 + 5000·j
  val CandStep = 5000L

  /** Score the candidate grid against a completed trial table
    * (config_id, threshold, obs_acc): (candidate_id, cand_threshold,
    * good_density, bad_density, score_micros, proposed). */
  def propose(trials: DataFrame): DataFrame =
    proposeGrid(trials, Gamma, BandW, CandLo, CandStep, CandN)

  /** [[propose]] with an explicit grid/kernel parameterization — the
    * same two-density machinery reused by [[TpeForecast]] over an
    * α-scaled candidate grid. */
  def proposeGrid(trials: DataFrame, gamma: Int, bandW: Long,
                  candLo: Long, candStep: Long, candN: Int): DataFrame = {
    val spark = trials.sparkSession
    import spark.implicits._
    val ranked = trials
      .withColumn("__r", row_number().over(
        Window.orderBy(col("obs_acc").desc, col("config_id").asc)))
      .withColumn("is_good", col("__r") <= gamma)
    val cand = (0 until candN)
      .map(j => (j.toLong, candLo + candStep * j))
      .toDF("candidate_id", "cand_threshold")
    val dens = cand.crossJoin(broadcast(ranked))
      .withColumn("__kern",
        greatest(lit(0L), lit(bandW) - abs(col("cand_threshold") - col("threshold"))))
      .groupBy("candidate_id", "cand_threshold")
      .agg(
        sum(when(col("is_good"), col("__kern")).otherwise(0L))
          .as("good_density"),
        sum(when(!col("is_good"), col("__kern")).otherwise(0L))
          .as("bad_density"))
      .withColumn("score_micros",
        expr("(1000000 * (good_density + 1)) div (bad_density + 1)"))
    dens
      .withColumn("proposed",
        (row_number().over(Window.orderBy(col("score_micros").desc,
          col("candidate_id").asc)) === 1).cast("int"))
      .select("candidate_id", "cand_threshold", "good_density",
        "bad_density", "score_micros", "proposed")
  }

  /** Observed accuracy per trial from the sweep output: the deepest
    * rung the config was evaluated at (ASHA kills between rungs). */
  def observed(sweep: DataFrame): DataFrame =
    sweep.select(col("config_id"), col("threshold"),
      when(col("promoted_2") === 1, col("acc_3"))
        .when(col("promoted_1") === 1, col("acc_2"))
        .when(col("promoted_0") === 1, col("acc_1"))
        .otherwise(col("acc_0")).as("obs_acc"))

  // ---- query-map entry (hash-gated) ----

  /** One TPE round over [[AshaSweep.ashaOrders]]'s completed trials. */
  def tpeOrders(spark: SparkSession, dir: String): DataFrame =
    propose(observed(AshaSweep.ashaOrders(spark, dir)))

  /** CLOSE the loop: evaluate round 1's proposal on the FULL
    * validation pool (the resource a finished trial gets), append it
    * to the trial table as config 16, and re-propose — the
    * suggest→observe→suggest cycle a real searcher runs. Everything
    * stays dataframe-side: the proposal row broadcasts into the pool
    * scan, the augmented trial table is a 17-row union. Gated output:
    * the ROUND-2 scored candidate table (the hash covers the
    * evaluation, the augmented split, and both density models). */
  def tpeRound2Orders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val trials = observed(AshaSweep.ashaOrders(spark, dir))
      .localCheckpoint() // consumed by round 1, the union, and round 2
    val prop1 = propose(trials).filter(col("proposed") === 1)
      .select(col("cand_threshold").as("__thr"))
    val pool = AshaSweep.validationPool(
      graft.Tables.orders(spark, dir).select(col("o_orderkey").as("id"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100")
          .as("dollars"),
        when(col("o_totalprice") > 250000.0, 1L).otherwise(0L)
          .as("label01")),
      "id", "dollars", "label01")
    val eval = pool.crossJoin(broadcast(prop1))
      .agg(
        first(col("__thr")).as("threshold"),
        expr("(1000000 * sum(CASE WHEN (__x > __thr) = (__y = 1)" +
          " THEN 1L ELSE 0L END)) div count(1)").as("obs_acc"))
      .select(lit(16L).as("config_id"), col("threshold"), col("obs_acc"))
    propose(trials.unionByName(eval))
  }

  /** The obs CTE (trial table) over the shared sweep chain. */
  private def obsCte: String =
    """obs AS (
      |  SELECT config_id, threshold,
      |    CASE WHEN promoted_2 THEN acc_3
      |         WHEN promoted_1 THEN acc_2
      |         WHEN promoted_0 THEN acc_1
      |         ELSE acc_0 END AS obs_acc
      |  FROM s2
      |)""".stripMargin

  /** The density/score chain over a (config_id, threshold, obs_acc)
    * trial CTE, with CTE names prefixed so two rounds can coexist. */
  private def proposalCtes(trialsCte: String, p: String): String =
    proposalCtesGrid(trialsCte, p, Gamma, BandW, CandLo, CandStep, CandN)

  /** Grid-parameterized form of the density/score chain — the oracle
    * twin of [[proposeGrid]], reused by [[TpeForecast]]. */
  private[ml] def proposalCtesGrid(trialsCte: String, p: String,
                                   gamma: Int, bandW: Long, candLo: Long,
                                   candStep: Long, candN: Int): String =
    s"""${p}rk AS (
       |  SELECT config_id, threshold,
       |    row_number() OVER (ORDER BY obs_acc DESC, config_id) <= $gamma
       |      AS is_good
       |  FROM $trialsCte
       |), ${p}cand AS (
       |  SELECT CAST(j AS BIGINT) AS candidate_id,
       |    CAST($candLo + $candStep * j AS BIGINT) AS cand_threshold
       |  FROM generate_series(0, ${candN - 1}) t(j)
       |), ${p}dens AS (
       |  SELECT c.candidate_id, c.cand_threshold,
       |    CAST(sum(CASE WHEN r.is_good
       |      THEN greatest(0, $bandW - abs(c.cand_threshold - r.threshold))
       |      ELSE 0 END) AS BIGINT) AS good_density,
       |    CAST(sum(CASE WHEN NOT r.is_good
       |      THEN greatest(0, $bandW - abs(c.cand_threshold - r.threshold))
       |      ELSE 0 END) AS BIGINT) AS bad_density
       |  FROM ${p}cand c CROSS JOIN ${p}rk r
       |  GROUP BY 1, 2
       |), ${p}scored AS (
       |  SELECT *, (1000000 * (good_density + 1)) // (bad_density + 1)
       |    AS score_micros
       |  FROM ${p}dens
       |)""".stripMargin

  private[ml] def proposalSelect(p: String): String =
    s"""SELECT candidate_id, cand_threshold, good_density, bad_density,
       |  CAST(score_micros AS BIGINT) AS score_micros,
       |  CAST(row_number() OVER (ORDER BY score_micros DESC, candidate_id)
       |    = 1 AS INT) AS proposed
       |FROM ${p}scored""".stripMargin

  def oracleSql: String =
    "WITH " + AshaSweep.oracleCtes + ",\n" + obsCte + ",\n" +
      proposalCtes("obs", "tpe") + "\n" + proposalSelect("tpe")

  def round2OracleSql: String =
    "WITH " + AshaSweep.oracleCtes + ",\n" + obsCte + ",\n" +
      proposalCtes("obs", "tpe") + ",\n" +
      s"""prop1 AS (
         |  SELECT cand_threshold AS thr FROM (
         |    SELECT cand_threshold,
         |      row_number() OVER (ORDER BY score_micros DESC, candidate_id)
         |        AS rn
         |    FROM tpescored) z
         |  WHERE rn = 1
         |), ev AS (
         |  SELECT CAST(16 AS BIGINT) AS config_id,
         |    CAST(p1.thr AS BIGINT) AS threshold,
         |    CAST((1000000 * sum(CASE WHEN (pool.dollars > p1.thr)
         |        = (pool.y = 1) THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
         |      AS obs_acc
         |  FROM pool CROSS JOIN prop1 p1
         |  GROUP BY p1.thr
         |), trials2 AS (
         |  SELECT * FROM obs UNION ALL SELECT * FROM ev
         |),
         |${proposalCtes("trials2", "r2")}
         |${proposalSelect("r2")}""".stripMargin
}
