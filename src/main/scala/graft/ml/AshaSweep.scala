package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Sampling

/** ASHA / successive-halving sweep in exact integers — the scheduler
  * the reference tunes with (ray.tune ASHAScheduler, grace_period +
  * reduction_factor 2: /root/reference/MachineLearning/Ray/tabular/
  * tune.py:595-599), re-expressed over DATA FRACTIONS: rung r scores
  * every surviving config on a nested, deterministically hash-chosen
  * fraction of the validation pool (1/8 → 1/4 → 1/2 → full), and only
  * the top half survives each rung — cheap rungs kill bad configs
  * before anyone pays a full evaluation, which is exactly the
  * scheduler's promise at 100 TB.
  *
  * Everything is one pass + bounded-table math: the per-(config, rung)
  * counts are conditional partial aggregates over validation ×
  * broadcast(configs) (configs bounded by the grid, rungs by log₂),
  * survivorship is a chain of rank windows over the CONFIG table
  * (16 rows), and accuracy reports in truncating ppm. Deterministic:
  * nested pools via [[Sampling.portableBucket]], ties by (acc desc,
  * config asc).
  */
object AshaSweep {

  /** The shared validation pool: top 20% of the bucket space (the
    * complement of the 0.8 train split the tree-model gates use);
    * nested rungs are prefixes of it. (__vb, __x, __y) — also consumed
    * by [[TpeSweep]]'s full-pool proposal evaluation. */
  def validationPool(validation: DataFrame, idCol: String,
                     valueCol: String, labelCol: String): DataFrame = {
    val b = Sampling.portableBucket(col(idCol))
    validation
      .filter(b >= lit((0.8 * Sampling.M).toLong))
      .select((b - lit((0.8 * Sampling.M).toLong)).as("__vb"),
        col(valueCol).as("__x"), col(labelCol).cast("long").as("__y"))
  }

  /** Threshold-classifier sweep: config j predicts positive iff
    * `valueCol` > thresholds(j). Returns one row per config:
    * (config_id, threshold, n_0..n_3, acc_0..acc_3 ppm,
    * promoted_0..promoted_2, winner). */
  def sweep(validation: DataFrame, idCol: String, valueCol: String,
            labelCol: String, thresholds: Seq[Long]): DataFrame = {
    val spark = validation.sparkSession
    import spark.implicits._
    val cfg = thresholds.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("config_id", "threshold")
    val pool = validationPool(validation, idCol, valueCol, labelCol)
    val rungCap = (r: Int) => lit((0.2 * Sampling.M).toLong / (8L >> r))
    val scored = pool.crossJoin(broadcast(cfg))
      .withColumn("__pred", (col("__x") > col("threshold")).cast("long"))
      .withColumn("__ok", (col("__pred") === col("__y")).cast("long"))
      .groupBy("config_id", "threshold")
      .agg(
        sum(when(col("__vb") < rungCap(0), 1L).otherwise(0L)).as("n_0"),
        (0 to 3).flatMap { r =>
          (if (r == 0) Nil else Seq(
            sum(when(col("__vb") < rungCap(r), 1L).otherwise(0L))
              .as(s"n_$r"))) :+
            sum(when(col("__vb") < rungCap(r), col("__ok")).otherwise(0L))
              .as(s"__c_$r")
        }: _*)
    val withAcc = (0 to 3).foldLeft(scored) { (df, r) =>
      df.withColumn(s"acc_$r",
        expr(s"CASE WHEN n_$r > 0 THEN (1000000 * __c_$r) div n_$r ELSE 0L END"))
    }
    // survivorship chain over the 16-row config table
    val k = thresholds.size
    val w0 = Window.orderBy(col("acc_0").desc, col("config_id").asc)
    val s0 = withAcc.withColumn("promoted_0",
      row_number().over(w0) <= k / 2)
    val w1 = Window.partitionBy("promoted_0")
      .orderBy(col("acc_1").desc, col("config_id").asc)
    val s1 = s0.withColumn("promoted_1",
      col("promoted_0") && row_number().over(w1) <= k / 4)
    val w2 = Window.partitionBy("promoted_1")
      .orderBy(col("acc_2").desc, col("config_id").asc)
    val s2 = s1.withColumn("promoted_2",
      col("promoted_1") && row_number().over(w2) <= k / 8)
    val w3 = Window.partitionBy("promoted_2")
      .orderBy(col("acc_3").desc, col("config_id").asc)
    // flags as 0/1 ints: the gate's value-hash is typed, booleans stay
    // out of the contract
    s2.withColumn("winner", col("promoted_2") && row_number().over(w3) === 1)
      .select(col("config_id"), col("threshold"),
        col("n_0"), col("acc_0"), col("n_1"), col("acc_1"),
        col("n_2"), col("acc_2"), col("n_3"), col("acc_3"),
        col("promoted_0").cast("int").as("promoted_0"),
        col("promoted_1").cast("int").as("promoted_1"),
        col("promoted_2").cast("int").as("promoted_2"),
        col("winner").cast("int").as("winner"))
  }

  // ---- query-map entry (hash-gated) ----

  private val Grid: Seq[Long] = (0 until 16).map(j => 60000L + 20000L * j)

  /** Gated instance: 16 whole-dollar price thresholds against the
    * planted label totalprice > 250000 on the validation hash split. */
  def ashaOrders(spark: SparkSession, dir: String): DataFrame =
    sweep(
      Tables.orders(spark, dir).select(col("o_orderkey").as("id"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 100")
          .as("dollars"),
        when(col("o_totalprice") > 250000.0, 1L).otherwise(0L)
          .as("label01")),
      "id", "dollars", "label01", Grid)

  /** The sweep chain through `s2` (config scores + promotion flags) —
    * shared with [[TpeSweep]]'s oracle, which models over the completed
    * trial table. */
  def oracleCtes: String = {
    val bucket = "(((id % 100003) * 1103515245 + 12345) % 1000000 + 1000000) % 1000000"
    val caps = Seq(25000L, 50000L, 100000L, 200000L)
    val aggCols = (0 to 3).map { r =>
      s"""CAST(sum(CASE WHEN vb < ${caps(r)} THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_$r,
         |    CAST(sum(CASE WHEN vb < ${caps(r)} THEN ok ELSE 0 END) AS BIGINT)
         |      AS c_$r""".stripMargin
    }.mkString(",\n    ")
    val accCols = (0 to 3).map(r =>
      s"CASE WHEN n_$r > 0 THEN (1000000 * c_$r) // n_$r ELSE 0 END AS acc_$r")
      .mkString(",\n  ")
    s"""o AS (
       |  SELECT o_orderkey AS id,
       |    CAST(round(o_totalprice * 100) AS BIGINT) // 100 AS dollars,
       |    CASE WHEN o_totalprice > 250000.0 THEN 1 ELSE 0 END AS y
       |  FROM orders
       |), pool AS (
       |  SELECT ($bucket) - 800000 AS vb, dollars, y
       |  FROM o WHERE ($bucket) >= 800000
       |), cfg AS (
       |  SELECT CAST(j AS BIGINT) AS config_id,
       |    CAST(60000 + 20000 * j AS BIGINT) AS threshold
       |  FROM generate_series(0, 15) t(j)
       |), joined AS (
       |  SELECT cfg.config_id, cfg.threshold, pool.vb,
       |    CASE WHEN (pool.dollars > cfg.threshold) = (pool.y = 1)
       |      THEN 1 ELSE 0 END AS ok
       |  FROM pool CROSS JOIN cfg
       |), scored AS (
       |  SELECT config_id, threshold,
       |    $aggCols
       |  FROM joined
       |  GROUP BY config_id, threshold
       |), acc AS (
       |  SELECT config_id, threshold, n_0, n_1, n_2, n_3,
       |  $accCols
       |  FROM scored
       |), s0 AS (
       |  SELECT *, row_number() OVER (ORDER BY acc_0 DESC, config_id)
       |    <= 8 AS promoted_0
       |  FROM acc
       |), s1 AS (
       |  SELECT *, promoted_0 AND row_number() OVER (PARTITION BY promoted_0
       |    ORDER BY acc_1 DESC, config_id) <= 4 AS promoted_1
       |  FROM s0
       |), s2 AS (
       |  SELECT *, promoted_1 AND row_number() OVER (PARTITION BY promoted_1
       |    ORDER BY acc_2 DESC, config_id) <= 2 AS promoted_2
       |  FROM s1
       |)""".stripMargin
  }

  def oracleSql: String =
    "WITH " + oracleCtes + "\n" +
      s"""SELECT config_id, threshold,
       |  n_0, CAST(acc_0 AS BIGINT) AS acc_0, n_1,
       |  CAST(acc_1 AS BIGINT) AS acc_1, n_2,
       |  CAST(acc_2 AS BIGINT) AS acc_2, n_3,
       |  CAST(acc_3 AS BIGINT) AS acc_3,
       |  CAST(promoted_0 AS INT) AS promoted_0,
       |  CAST(promoted_1 AS INT) AS promoted_1,
       |  CAST(promoted_2 AS INT) AS promoted_2,
       |  CAST(promoted_2 AND row_number() OVER (PARTITION BY promoted_2
       |    ORDER BY acc_3 DESC, config_id) = 1 AS INT) AS winner
       |FROM s2""".stripMargin
}
