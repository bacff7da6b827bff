package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.{quantize, sumQ}

/** One POWER-ITERATION step toward the corpus's principal component,
  * in exact integer arithmetic — the PCA/whitening pre-pass of the ANN
  * family (FAISS's OPQ/PCAR transforms train exactly this way before
  * IVF/PQ quantization; /root/reference/MachineLearning/ML/
  * performant_faiss.py's index strings sit downstream of such vector
  * transforms). Gated the way [[KmeansStep]] gates Lloyd: the
  * distributed iteration primitive itself, pinned cross-engine.
  *
  * The step computes w = C·v₀ for the all-ones start vector v₀ over
  * the n²-scaled covariance C_jk = n·Σxⱼxₖ − SⱼSₖ WITHOUT forming the
  * d² matrix: (C·1)ⱼ = n·Σᵢ(xᵢⱼ·sᵢ) − Sⱼ·T, where sᵢ is row i's
  * coordinate sum and T = ΣSₖ — one map-side row-sum, one per-dim
  * aggregation, O(n·d) total. Everything stays in milli-quantized
  * BIGINTs ([[graft.functions.QuantizeVec]]): n·Σ(x·s) peaks near
  * n²·d·maxX² ≈ 7e15 at the sf1-replica scales — headroom to n ≈ 2e6
  * vectors, past which the two products move to DECIMAL(38,0).
  *
  * Output per dim: (dim, n_points, sum_milli, var_n2, cv1) — the
  * diagonal n²-variance and the iterate component. A caller chasing
  * the eigenvector re-feeds cv1 (rescaled) as the next v; one step is
  * what the gate pins, like kmeans_step vs kmeans_step2.
  */
object PcaPowerStep {

  /** One power step from the ones vector over milli-quantized `vecCol`. */
  def powerStep(df: DataFrame, vecCol: String): DataFrame = {
    // row sums through the codegen'd LongArraySum — the aggregate-HOF
    // form is interpreted and re-enters its lambda d times per row
    val pts = df.select(quantize(col(vecCol)).as("__e"))
      .withColumn("__rs", sumQ(col("__e")))
    val perDim = pts
      .select(col("__rs"), posexplode(col("__e")).as(Seq("__dim", "__x")))
      .groupBy(col("__dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_points"),
        sum("__x").as("sum_milli"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__x") * col("__rs")).as("__sxs"))
    val totals = perDim.agg(sum("sum_milli").as("__t"))
    perDim.crossJoin(broadcast(totals))
      .withColumn("var_n2",
        col("n_points") * col("__sxx") - col("sum_milli") * col("sum_milli"))
      .withColumn("cv1",
        col("n_points") * col("__sxs") - col("sum_milli") * col("__t"))
      .select("dim", "n_points", "sum_milli", "var_n2", "cv1")
  }

  /** TWO chained power steps: step 2 scores against the iterate from
    * step 1, rescaled to exact integer ±500 by its max component
    * (v1ⱼ = (500·cv1ⱼ) div max|cv1| — truncating division, identical in
    * both engines), so the w→v feedback edge of the power loop is
    * itself inside the hash gate — the [[KmeansStep.kmeansStep2Embeddings]]
    * move for PCA. The general multiply (C·v)ⱼ = n·Σᵢ(xᵢⱼ·pᵢ) − Sⱼ·(S·v)
    * with pᵢ = xᵢ·v needs one broadcast of the d-component v and one
    * more per-dim aggregation — still O(n·d), the d² matrix never
    * forms. pᵢ ≤ d·maxX·500 keeps per-row products in BIGINT; the final
    * n·Σ − S·(S·v) combination runs in DECIMAL(38,0) (oracle: HUGEINT)
    * and lands back in BIGINT at gated magnitudes.
    *
    * Output per dim: (dim, n_points, v1, cv2). */
  def powerStep2(df: DataFrame, vecCol: String): DataFrame = {
    val pts = df.select(quantize(col(vecCol)).as("__e"))
      .withColumn("__rs", sumQ(col("__e")))
    val perDim = pts
      .select(col("__rs"), posexplode(col("__e")).as(Seq("__dim", "__x")))
      .groupBy(col("__dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_points"),
        sum("__x").as("sum_milli"),
        sum(col("__x") * col("__rs")).as("__sxs"))
    val totals = perDim.agg(sum("sum_milli").as("__t"))
    val step1 = perDim.crossJoin(broadcast(totals))
      .withColumn("cv1",
        col("n_points") * col("__sxs") - col("sum_milli") * col("__t"))
    val mx = step1.agg(max(abs(col("cv1"))).as("__m"))
    // d rows; checkpointed so the three consumers below share one
    // evaluation instead of re-running the step-1 aggregation
    val v1 = step1.crossJoin(broadcast(mx))
      .withColumn("v1",
        when(col("__m") === 0, lit(0L))
          .otherwise(expr("(500 * cv1) div __m")))
      .select("dim", "n_points", "sum_milli", "v1")
      .localCheckpoint()
    val varr = v1.agg(
      expr("transform(sort_array(collect_list(struct(dim, v1))), z -> z.v1)")
        .as("__v1arr"))
    val sdv = v1.agg(sum(col("sum_milli") * col("v1")).as("__sv"))
    val perDim2 = pts.crossJoin(broadcast(varr))
      .withColumn("__p", graft.functions.VectorFunctions.dotQ(col("__e"), col("__v1arr")))
      .select(col("__p"), posexplode(col("__e")).as(Seq("__dim", "__x")))
      .groupBy(col("__dim").cast("long").as("dim"))
      .agg(sum(col("__x") * col("__p")).as("__sxv"))
    perDim2.join(v1, "dim")
      .crossJoin(broadcast(sdv))
      .withColumn("cv2", expr(
        """CAST(CAST(n_points AS DECIMAL(38,0)) * __sxv
          | - CAST(sum_milli AS DECIMAL(38,0)) * __sv AS BIGINT)""".stripMargin))
      .select("dim", "n_points", "v1", "cv2")
  }

  // ---- query-map entries (hash-gated) ----

  /** Gated instance: one power step over the embeddings corpus. */
  def pcaPowerStepEmbeddings(spark: SparkSession, dir: String): DataFrame =
    powerStep(Tables.embeddings(spark, dir), "embedding")

  /** Gated instance: the chained two-step form. */
  def pcaPowerStep2Embeddings(spark: SparkSession, dir: String): DataFrame =
    powerStep2(Tables.embeddings(spark, dir), "embedding")

  /** Shared CTE prefix: quantized vectors, row sums, long-form
    * (vec_id, dim, v), per-dim sums, corpus total. */
  private val baseCtes: String =
    """e AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS em
      |  FROM embeddings
      |), s AS (
      |  SELECT vec_id, em, CAST(list_sum(em) AS BIGINT) AS rs FROM e
      |), x AS (
      |  SELECT vec_id, rs, unnest(em) AS v,
      |    unnest(range(0, len(em))) AS dim
      |  FROM s
      |), agg AS (
      |  SELECT dim, count(*) AS n, CAST(sum(v) AS BIGINT) AS sx,
      |    CAST(sum(v * v) AS BIGINT) AS sxx,
      |    CAST(sum(v * rs) AS BIGINT) AS sxs
      |  FROM x GROUP BY 1
      |), tot AS (SELECT CAST(sum(sx) AS BIGINT) AS t FROM agg)""".stripMargin

  def oracleSql: String =
    s"""WITH $baseCtes
      |SELECT CAST(dim AS BIGINT) AS dim, n AS n_points, sx AS sum_milli,
      |  n * sxx - sx * sx AS var_n2,
      |  n * sxs - sx * t AS cv1
      |FROM agg CROSS JOIN tot""".stripMargin

  def oracle2Sql: String =
    s"""WITH $baseCtes,
      |step1 AS (
      |  SELECT dim, n, sx, n * sxs - sx * t AS cv1
      |  FROM agg CROSS JOIN tot
      |), mx AS (SELECT max(abs(cv1)) AS m FROM step1),
      |v1 AS (
      |  SELECT dim, n, sx,
      |    CASE WHEN m = 0 THEN 0 ELSE (500 * cv1) // m END AS w
      |  FROM step1 CROSS JOIN mx
      |), p AS (
      |  SELECT x.vec_id, CAST(sum(x.v * v1.w) AS BIGINT) AS pv
      |  FROM x JOIN v1 USING (dim) GROUP BY x.vec_id
      |), sdv AS (SELECT CAST(sum(sx * w) AS BIGINT) AS sv FROM v1),
      |agg2 AS (
      |  SELECT x.dim, CAST(sum(x.v * p.pv) AS BIGINT) AS sxv
      |  FROM x JOIN p USING (vec_id) GROUP BY x.dim
      |)
      |SELECT CAST(v1.dim AS BIGINT) AS dim, v1.n AS n_points,
      |  CAST(v1.w AS BIGINT) AS v1,
      |  CAST(CAST(v1.n AS HUGEINT) * a2.sxv
      |    - CAST(v1.sx AS HUGEINT) * sdv.sv AS BIGINT) AS cv2
      |FROM v1 JOIN agg2 a2 ON v1.dim = a2.dim CROSS JOIN sdv""".stripMargin
}
