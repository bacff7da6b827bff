package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Stratified k-fold assignment — the cross-validation splitter next to
  * [[Sampling.hashSplitDocuments]]'s train/val/test split and
  * [[FeaturePipeline]]'s leakage-safe group split (the reference
  * evaluates on a single split, spark_randomforest.py:41-50; k-fold is
  * the standard upgrade). Deterministic and engine-portable: the fold
  * is a pure function of the row id ([[Sampling.portableBucket]] mod k),
  * so the SAME row lands in the SAME fold on any engine, any
  * partitioning, any run — reproducible CV without a stored assignment
  * table.
  *
  * Output is the per-(stratum, fold) balance sheet rather than the
  * row-level tagging (that is one `withColumn`; the sheet is what a
  * pipeline asserts on): counts plus each fold's share of its stratum
  * in micros. Scale: one aggregate on (stratum, fold) — cardinality
  * |strata|·k — after a map-side fold computation.
  */
object KFold {

  /** Row-level fold tag in [0, k): the bucket RANGE maps to folds,
    * `(bucket · k) DIV M` — never `bucket % k`, whose low-order bits the
    * LCG leaves degenerate (multiplier and modulus share small factors:
    * mod 5, EVERY bucket lands on fold 0). `floor` of the double ratio
    * is exact here — bucket·k < 2^53 — and truncation on non-negative
    * values matches SQL integer division. */
  def foldOf(idCol: String, k: Int) =
    floor(Sampling.portableBucket(col(idCol)) * k / Sampling.M).cast("long")

  /** (stratum, fold, n, stratum_n, share_micros) for `k` folds. */
  def balance(df: DataFrame, idCol: String, stratumCol: String,
              k: Int): DataFrame = {
    require(k >= 2, "need at least two folds")
    val tagged = df.select(col(stratumCol).as("stratum"),
      foldOf(idCol, k).as("fold"))
    val counts = tagged.groupBy("stratum", "fold").agg(count(lit(1)).as("n"))
    val strata = counts.groupBy("stratum").agg(sum("n").as("stratum_n"))
    counts.join(broadcast(strata), "stratum")
      .withColumn("share_micros",
        round(col("n").cast("double") / col("stratum_n") * lit(1e6)).cast("long"))
      .select("stratum", "fold", "n", "stratum_n", "share_micros")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: 5-fold balance over orders stratified by status. */
  def kfoldOrders(spark: SparkSession, dir: String): DataFrame =
    balance(Tables.orders(spark, dir), "o_orderkey", "o_orderstatus", k = 5)
      .withColumnRenamed("stratum", "o_orderstatus")

  def oracleSql: String =
    """WITH tagged AS (
      |  SELECT o_orderstatus,
      |    (((((o_orderkey % 100003) * 1103515245 + 12345) % 1000000
      |      + 1000000) % 1000000) * 5) // 1000000 AS fold
      |  FROM orders
      |), c AS (
      |  SELECT o_orderstatus, fold, count(*) AS n FROM tagged GROUP BY 1, 2
      |), s AS (
      |  SELECT o_orderstatus, CAST(sum(n) AS BIGINT) AS stratum_n
      |  FROM c GROUP BY 1
      |)
      |SELECT c.o_orderstatus, CAST(fold AS BIGINT) AS fold, n, stratum_n,
      |  CAST(round(CAST(n AS DOUBLE) / stratum_n * 1e6) AS BIGINT)
      |    AS share_micros
      |FROM c JOIN s USING (o_orderstatus)""".stripMargin
}
