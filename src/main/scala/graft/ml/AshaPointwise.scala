package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** ASHA successive halving over the POINTWISE RANKER — the SCHEDULER
  * half of the reference's tune-over-recsys workflow
  * (/root/reference/MachineLearning/Ray/recsys/ray_tune_pointwise.py:
  * 744-753: `ASHAScheduler(grace_period=3, reduction_factor=2)` runs
  * NEXT TO `HyperOptSearch` over the pointwise model).
  * [[TpePointwise]] closed the searcher half (TPE proposal over the
  * completed trials); this key closes the scheduler half: the SAME 16
  * negative-ratio fits race through reduction-factor-2 rungs and only
  * the top half survives each rung, [[AshaSweep]]'s exact promotion
  * discipline applied to the pointwise model's real objective.
  *
  * Resource axis: the EVALUATION budget — rung r scores every config's
  * exact-mean nDCG@10 on a nested, deterministically hash-chosen
  * fraction of the user pool (1/8 → 1/4 → 1/2 → full,
  * [[Sampling.portableBucket]] prefixes on user_id), the
  * partial-validation readout a scheduler uses to kill bad configs
  * before anyone pays a full evaluation. The full-pool rung equals
  * [[TpePointwise.trialTable]]'s observed objective by construction
  * (the spec asserts it), so the scheduler and the searcher verifiably
  * race the SAME scoreboard.
  *
  * Scale shape: the corpus cost is ONE scoring fold — the per-(config,
  * user) nDCG frame [[TpePointwise.perUserNdcg]] already computes for
  * the searcher (item-dim ranks + the single-pass MultiTopKDcg fold,
  * nothing trial-times-corpus) — and every rung readout after it is a
  * conditional aggregate over the USER-domain frame (users × 16 rows)
  * plus rank windows over the 16-row config table. Promotion ties
  * break (ndcg desc, config_id asc), deterministic.
  */
object AshaPointwise {

  /** Rung caps: bucket-space prefixes 1/8, 1/4, 1/2, full. */
  private val RungCaps: Seq[Long] = Seq(8L, 4L, 2L, 1L).map(Sampling.M / _)

  /** Successive-halving scoreboard over per-(config, user) nDCG rows:
    * (config_id, threshold, n_0..3, ndcg_0..3, promoted_0..2, winner).
    * `pu` is [[TpePointwise.perUserNdcg]]'s output; n_r counts the
    * rung's scoreable users (idcg > 0 — config-independent), ndcg_r is
    * the rung's truncating exact mean in permicro. */
  private[graft] def halve(pu: DataFrame): DataFrame = {
    val ub = Sampling.portableBucket(col("user_id"))
    val inRung = (r: Int) => ub < lit(RungCaps(r))
    val aggCols = (0 to 3).flatMap { r =>
      Seq(
        sum(when(inRung(r) && col("__ndcg").isNotNull, 1L).otherwise(0L))
          .as(s"n_$r"),
        // no otherwise: out-of-rung and unscoreable users contribute
        // NULL, which sum skips — the rung mean is over scored users
        sum(when(inRung(r), col("__ndcg"))).as(s"__s_$r"))
    }
    val scored = pu
      .groupBy("config_id", "threshold")
      .agg(aggCols.head, aggCols.tail: _*)
    val withNdcg = (0 to 3).foldLeft(scored) { (df, r) =>
      df.withColumn(s"ndcg_$r",
        expr(s"CASE WHEN n_$r > 0 THEN __s_$r div n_$r ELSE 0L END"))
    }
    // AshaSweep's survivorship chain over the 16-row config table
    val w0 = Window.orderBy(col("ndcg_0").desc, col("config_id").asc)
    val s0 = withNdcg.withColumn("promoted_0", row_number().over(w0) <= 8)
    val w1 = Window.partitionBy("promoted_0")
      .orderBy(col("ndcg_1").desc, col("config_id").asc)
    val s1 = s0.withColumn("promoted_1",
      col("promoted_0") && row_number().over(w1) <= 4)
    val w2 = Window.partitionBy("promoted_1")
      .orderBy(col("ndcg_2").desc, col("config_id").asc)
    val s2 = s1.withColumn("promoted_2",
      col("promoted_1") && row_number().over(w2) <= 2)
    val w3 = Window.partitionBy("promoted_2")
      .orderBy(col("ndcg_3").desc, col("config_id").asc)
    s2.withColumn("winner", col("promoted_2") && row_number().over(w3) === 1)
      .select(Seq(col("config_id"), col("threshold")) ++
        (0 to 3).flatMap(r => Seq(col(s"n_$r"), col(s"ndcg_$r"))) ++
        Seq(col("promoted_0").cast("int").as("promoted_0"),
          col("promoted_1").cast("int").as("promoted_1"),
          col("promoted_2").cast("int").as("promoted_2"),
          col("winner").cast("int").as("winner")): _*)
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: the 16 negative-ratio fits of
    * [[TpePointwise.tpePointwiseOrders]] raced through the four rungs. */
  def ashaPointwiseOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (featsRaw, itemDim) = TpePointwise.drawFeatures(spark, dir)
    val feats = featsRaw
      .localCheckpoint(true, TpePointwise.featsLevel(spark, dir))
    val partRows = graft.ParquetMeta.rowCount(spark, s"$dir/part.parquet")
    val confs = (1 to TpePointwise.TrialN)
      .map(j => (j.toLong, j * (1000000L / TpePointwise.TrialN), j.toLong))
      .toDF("config_id", "threshold", "__cfg")
    val fits = TpePointwise.cramer(
      TpePointwise.prefixSums(TpePointwise.groupedSums(feats), confs))
    halve(TpePointwise.perUserNdcg(feats, fits, Some(itemDim), partRows))
  }

  /** Composed DuckDB oracle: [[TpePointwise]]'s feature/fit/per-user
    * CTEs + the bucketed rung aggregate + the promotion windows
    * ([[AshaSweep]]'s oracle chain over ndcg). */
  def oracleSql: String = {
    val bucket =
      "(((user_id % 100003) * 1103515245 + 12345) % 1000000 + 1000000)" +
        " % 1000000"
    val aggCols = (0 to 3).map { r =>
      s"""CAST(sum(CASE WHEN ub < ${RungCaps(r)} AND ndcg IS NOT NULL
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_$r,
         |    CAST(sum(CASE WHEN ub < ${RungCaps(r)} THEN ndcg END)
         |      AS BIGINT) AS s_$r""".stripMargin
    }.mkString(",\n    ")
    val ndcgCols = (0 to 3).map(r =>
      s"CASE WHEN n_$r > 0 THEN s_$r // n_$r ELSE 0 END AS ndcg_$r")
      .mkString(",\n  ")
    s"""WITH ${TpePointwise.featCtes},
       |${TpePointwise.round1Sums},
       |${TpePointwise.fitPerUserCtes("t1", "t1sums")},
       |pun AS (
       |  SELECT config_id, threshold, user_id,
       |    CASE WHEN idcg > 0 THEN (1000000 * dcg) // idcg END AS ndcg,
       |    $bucket AS ub
       |  FROM t1pu
       |), scored AS (
       |  SELECT config_id, CAST(threshold AS BIGINT) AS threshold,
       |    $aggCols
       |  FROM pun
       |  GROUP BY 1, 2
       |), acc AS (
       |  SELECT config_id, threshold, n_0, n_1, n_2, n_3,
       |  $ndcgCols
       |  FROM scored
       |), s0 AS (
       |  SELECT *, row_number() OVER (ORDER BY ndcg_0 DESC, config_id)
       |    <= 8 AS promoted_0
       |  FROM acc
       |), s1 AS (
       |  SELECT *, promoted_0 AND row_number() OVER (PARTITION BY promoted_0
       |    ORDER BY ndcg_1 DESC, config_id) <= 4 AS promoted_1
       |  FROM s0
       |), s2 AS (
       |  SELECT *, promoted_1 AND row_number() OVER (PARTITION BY promoted_1
       |    ORDER BY ndcg_2 DESC, config_id) <= 2 AS promoted_2
       |  FROM s1
       |)
       |SELECT config_id, threshold,
       |  n_0, CAST(ndcg_0 AS BIGINT) AS ndcg_0, n_1,
       |  CAST(ndcg_1 AS BIGINT) AS ndcg_1, n_2,
       |  CAST(ndcg_2 AS BIGINT) AS ndcg_2, n_3,
       |  CAST(ndcg_3 AS BIGINT) AS ndcg_3,
       |  CAST(promoted_0 AS INT) AS promoted_0,
       |  CAST(promoted_1 AS INT) AS promoted_1,
       |  CAST(promoted_2 AS INT) AS promoted_2,
       |  CAST(promoted_2 AND row_number() OVER (PARTITION BY promoted_2
       |    ORDER BY ndcg_3 DESC, config_id) = 1 AS INT) AS winner
       |FROM s2""".stripMargin
  }
}
