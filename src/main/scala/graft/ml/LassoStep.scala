package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** One full LASSO coordinate-descent sweep from b = 0, for a whole
  * penalty path in one fact scan — the L1 sibling of [[Ridge]]'s λ
  * path: ridge shrinks, lasso SELECTS (soft-thresholding zeroes a
  * coordinate outright), and the per-λ nonzero pattern is the feature
  * screen the reference's tuning loops buy with refits
  * (/root/reference/MachineLearning/Ray/recsys/tune_recsys.py).
  * One CD sweep from zero is the textbook first iteration — the gate
  * pins ITERATION arithmetic, not the converged fit (same contract as
  * kmeans_step / logreg_newton_step).
  *
  * Update order is declared: b0 = ȳ (unpenalized), then b1, then b2
  * USING the fresh b1 (true cyclic CD, not Jacobi). Determinism
  * discipline is quantize-then-propagate: each coefficient is
  * truncated to micros BEFORE the next coordinate consumes it, so
  * every downstream term is integer arithmetic on already-quantized
  * values — no rational blow-up, both engines bit-identical. The λ
  * path is scale-free (threshold = 10⁶·c·n, c integer units per row —
  * the correlation sums grow linearly in n, an absolute λ would vanish
  * at 100 TB).
  *
  * Magnitude headroom: z-terms are 10⁶-scaled correlation sums
  * (≤ 10⁶·n·x·y ≈ 10³⁵ at 10¹² rows of cent-scale features) in
  * DECIMAL(38,0); every div quotient is a micro-coefficient (≤ ~10¹³),
  * BIGINT-safe.
  *
  * Scale: ONE map-side-combined aggregation to a single sufficient-
  * statistics row; the path is a 4-row constant join against it.
  */
object LassoStep {

  /** Lasso CD sweep for y ≈ b0 + b1·x1 + b2·x2: one row per c in
    * `lambdaPerRow`, columns (lambda_per_row, n, b0_micros, b1_micros,
    * b2_micros, nnz). */
  def lassoSweep(df: DataFrame, y: Column, x1: Column, x2: Column,
                 lambdaPerRow: Seq[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val d38 = "decimal(38,0)"
    val sums = df.select(y.as("__y"), x1.as("__x1"), x2.as("__x2"))
      .agg(count(lit(1)).as("n"),
        sum("__x1").as("s1"), sum("__x2").as("s2"), sum("__y").as("sy"),
        sum(col("__x1") * col("__x1")).as("s11"),
        sum(col("__x1") * col("__x2")).as("s12"),
        sum(col("__x2") * col("__x2")).as("s22"),
        sum(col("__x1") * col("__y")).as("s1y"),
        sum(col("__x2") * col("__y")).as("s2y"))
    val dec = Seq("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y")
      .foldLeft(sums) { (d, c) =>
        d.withColumn(s"${c}d", col(c).cast(d38))
      }
    val path = lambdaPerRow.toDF("lambda_per_row")
    dec.crossJoin(path)
      .withColumn("lamd", col("lambda_per_row").cast(d38))
      // b0 = ȳ in micros (truncating — the quantization every later
      // term consumes)
      .withColumn("b0_micros", expr(
        """(CASE WHEN sy < 0 THEN -1L ELSE 1L END)
           * ((CAST(1000000 AS DECIMAL(38,0)) * abs(syd)) div nd)"""))
      // z1 = 10⁶·Σ x1(y − b0) with the QUANTIZED b0
      .withColumn("z1", expr(
        "CAST(1000000 AS DECIMAL(38,0)) * s1yd - CAST(b0_micros AS DECIMAL(38,0)) * s1d"))
      .withColumn("thr", expr(
        "CAST(1000000 AS DECIMAL(38,0)) * lamd * nd"))
      .withColumn("b1_micros", expr(
        """CASE WHEN abs(z1) > thr THEN
             (CASE WHEN z1 < 0 THEN -1L ELSE 1L END)
               * ((abs(z1) - thr) div s11d)
           ELSE 0L END"""))
      // z2 = 10⁶·Σ x2(y − b0 − b1·x1) with BOTH quantized coefficients
      .withColumn("z2", expr(
        """CAST(1000000 AS DECIMAL(38,0)) * s2yd
           - CAST(b0_micros AS DECIMAL(38,0)) * s2d
           - CAST(b1_micros AS DECIMAL(38,0)) * s12d"""))
      .withColumn("b2_micros", expr(
        """CASE WHEN abs(z2) > thr THEN
             (CASE WHEN z2 < 0 THEN -1L ELSE 1L END)
               * ((abs(z2) - thr) div s22d)
           ELSE 0L END"""))
      .select(col("lambda_per_row").cast("long").as("lambda_per_row"),
        col("n"), col("b0_micros"), col("b1_micros"), col("b2_micros"),
        (when(col("b1_micros") =!= 0L, 1L).otherwise(0L)
          + when(col("b2_micros") =!= 0L, 1L).otherwise(0L)).as("nnz"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: [[Ridge]]'s exact feature set swept over
    * c ∈ {0, 5, 50, 500} lasso units per row — large c must zero the
    * weak discount coordinate before the strong quantity one
    * (spec-pinned selection order). */
  def lassoLineitem(spark: SparkSession, dir: String): DataFrame =
    lassoSweep(Tables.lineitem(spark, dir),
      y = round(col("l_extendedprice")).cast("long"),
      x1 = round(col("l_quantity")).cast("long"),
      x2 = round(col("l_discount") * 100).cast("long"),
      lambdaPerRow = Seq(0L, 5L, 50L, 500L))

  def oracleSql: String =
    """WITH s AS (
      |  SELECT CAST(count(*) AS HUGEINT) AS n,
      |    CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
      |    CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(x1 * x1) AS HUGEINT) AS s11,
      |    CAST(sum(x1 * x2) AS HUGEINT) AS s12,
      |    CAST(sum(x2 * x2) AS HUGEINT) AS s22,
      |    CAST(sum(x1 * y) AS HUGEINT) AS s1y,
      |    CAST(sum(x2 * y) AS HUGEINT) AS s2y
      |  FROM (
      |    SELECT CAST(round(l_extendedprice) AS BIGINT) AS y,
      |      CAST(round(l_quantity) AS BIGINT) AS x1,
      |      CAST(round(l_discount * 100) AS BIGINT) AS x2
      |    FROM lineitem
      |  )
      |), p AS (
      |  SELECT c.lambda_per_row, s.*,
      |    (CASE WHEN sy < 0 THEN -1 ELSE 1 END)
      |      * ((1000000 * abs(sy)) // n) AS b0_micros,
      |    1000000 * c.lambda_per_row * n AS thr
      |  FROM s CROSS JOIN (
      |    VALUES (CAST(0 AS HUGEINT)), (CAST(5 AS HUGEINT)),
      |           (CAST(50 AS HUGEINT)), (CAST(500 AS HUGEINT))
      |  ) c(lambda_per_row)
      |), step1 AS (
      |  SELECT *, 1000000 * s1y - b0_micros * s1 AS z1 FROM p
      |), b1 AS (
      |  SELECT *,
      |    CASE WHEN abs(z1) > thr THEN
      |      (CASE WHEN z1 < 0 THEN -1 ELSE 1 END)
      |        * ((abs(z1) - thr) // s11)
      |    ELSE 0 END AS b1_micros
      |  FROM step1
      |), step2 AS (
      |  SELECT *, 1000000 * s2y - b0_micros * s2 - b1_micros * s12 AS z2
      |  FROM b1
      |), b2 AS (
      |  SELECT *,
      |    CASE WHEN abs(z2) > thr THEN
      |      (CASE WHEN z2 < 0 THEN -1 ELSE 1 END)
      |        * ((abs(z2) - thr) // s22)
      |    ELSE 0 END AS b2_micros
      |  FROM step2
      |)
      |SELECT CAST(lambda_per_row AS BIGINT) AS lambda_per_row,
      |  CAST(n AS BIGINT) AS n,
      |  CAST(b0_micros AS BIGINT) AS b0_micros,
      |  CAST(b1_micros AS BIGINT) AS b1_micros,
      |  CAST(b2_micros AS BIGINT) AS b2_micros,
      |  CAST((CASE WHEN b1_micros <> 0 THEN 1 ELSE 0 END)
      |     + (CASE WHEN b2_micros <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz
      |FROM b2""".stripMargin
}
