package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.quantize

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
    val pts = df.select(quantize(col(vecCol)).as("__e"))
      .withColumn("__rs",
        aggregate(col("__e"), lit(0L), (acc, x) => acc + x))
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

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: one power step over the embeddings corpus. */
  def pcaPowerStepEmbeddings(spark: SparkSession, dir: String): DataFrame =
    powerStep(Tables.embeddings(spark, dir), "embedding")

  def oracleSql: String =
    """WITH e AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS em
      |  FROM embeddings
      |), s AS (
      |  SELECT vec_id, em, CAST(list_sum(em) AS BIGINT) AS rs FROM e
      |), x AS (
      |  SELECT rs, unnest(em) AS v,
      |    unnest(range(0, len(em))) AS dim
      |  FROM s
      |), agg AS (
      |  SELECT dim, count(*) AS n, CAST(sum(v) AS BIGINT) AS sx,
      |    CAST(sum(v * v) AS BIGINT) AS sxx,
      |    CAST(sum(v * rs) AS BIGINT) AS sxs
      |  FROM x GROUP BY 1
      |), tot AS (SELECT CAST(sum(sx) AS BIGINT) AS t FROM agg)
      |SELECT CAST(dim AS BIGINT) AS dim, n AS n_points, sx AS sum_milli,
      |  n * sxx - sx * sx AS var_n2,
      |  n * sxs - sx * t AS cv1
      |FROM agg CROSS JOIN tot""".stripMargin
}
