package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ann.KmeansStep
import graft.functions.VectorFunctions.{dotQ, quantize}

/** SemDeDup — semantic deduplication by cluster-then-prune (Abbas,
  * Tirumala, Simig, Ganguli, Morcos 2023, arXiv:2303.09540): k-means
  * the embedding space, then look for near-duplicates ONLY within each
  * cluster — the trick that turns the O(n²) all-pairs cosine scan into
  * k independent O((n/k)²) cells, the practical route to semantic
  * dedup at web-corpus scale (the paper prunes LAION/C4 this way; the
  * reference's FAISS IVF training,
  * /root/reference/MachineLearning/ML/performant_faiss.py, builds the
  * same cluster geometry for retrieval).
  *
  * Composition of two already-gated exact components: centroids are
  * the means of ONE Lloyd round from the planted seeds
  * ([[KmeansStep]], integer milli-quantized), assignment is the same
  * exact integer argmin (ties to the lower centroid id), and the
  * within-cluster cosine is the quantized-integer dot over exact
  * norms ([[EmbeddingDedup]]'s determinism: one IEEE division of
  * integer-derived doubles, bit-identical cross-engine).
  *
  * Dedup contract (deterministic, relational): vector v is a duplicate
  * iff SOME lower-id vector in v's cluster has cosine ≥ τ with it —
  * the keep-lowest-id variant of the paper's keep-one-per-group rule
  * (documented as such; the greedy keep-set chain differs only on
  * τ-boundary chains).
  *
  * Scale shape: one corpus pass for the Lloyd round (k·d bounded
  * means), one broadcast-assignment pass, then the pair join shuffles
  * on cluster id — per-cell quadratic, globally n²/k, with k chosen
  * proportional to corpus size in production (the paper uses
  * √n-scale k). Nothing all-pairs.
  */
object SemDedup {

  /** Within-cluster near-dup flags over an embeddings frame. Returns
    * (vec_id, cluster, n_cluster, is_dup). */
  def semdedup(vecs: DataFrame, idCol: String, vecCol: String,
               k: Int, tau: Double): DataFrame = {
    // one Lloyd round from the planted seeds → k·d means (bounded)
    val cents = KmeansStep
      .meansAsCentroids(KmeansStep.step(vecs, idCol, vecCol, k))
      .withColumn("__cnrm", dotQ(col("cvec"), col("cvec")))
      .localCheckpoint()
    val pts = vecs.select(col(idCol).cast("long").as("__id"),
        quantize(col(vecCol)).as("__e"))
      .withColumn("__nrm", dotQ(col("__e"), col("__e")))
    val assigned = pts.crossJoin(broadcast(cents))
      .withColumn("__d2",
        col("__nrm") + col("__cnrm") - lit(2L) * dotQ(col("__e"), col("cvec")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__id").orderBy(col("__d2"), col("centroid"))))
      .filter(col("__rn") === 1)
      .select(col("__id"), col("__e"), col("__nrm"),
        col("centroid").as("__cid"))
      .localCheckpoint() // pair join (both sides) + sizes + output
    val sizes = assigned.groupBy(col("__cid"))
      .agg(count(lit(1)).as("n_cluster"))
    val dupIds = assigned.as("a").join(assigned.as("b"),
        col("a.__cid") === col("b.__cid") && col("a.__id") < col("b.__id"))
      .filter(
        (dotQ(col("a.__e"), col("b.__e")).cast("double")
          / (sqrt(col("a.__nrm").cast("double"))
            * sqrt(col("b.__nrm").cast("double")))) >= tau)
      .select(col("b.__id").as("__id")).distinct()
      .withColumn("__dup", lit(true))
    assigned
      .join(dupIds, Seq("__id"), "left")
      .join(broadcast(sizes), "__cid")
      .select(col("__id").as("vec_id"), col("__cid").as("cluster"),
        col("n_cluster"), coalesce(col("__dup"), lit(false)).as("is_dup"))
  }

  // ---- query-map entry (hash-gated) ----

  private val gatedK = 8
  private val gatedTau = 0.5

  def semdedupEmbeddings(spark: SparkSession, dir: String): DataFrame =
    semdedup(Tables.embeddings(spark, dir), "vec_id", "embedding",
      gatedK, gatedTau)

  /** Oracle: [[KmeansStep]]'s own CTE chain (one round + mean fold)
    * supplies the centroids; assignment, the within-cluster pair scan,
    * and the lower-id dup rule replay in SQL. */
  def oracleSql: String =
    s"""WITH ${KmeansStep.baseCtes},
       |${KmeansStep.stepCtes("c1", "1")},
       |${KmeansStep.centroidCte("1", "c2")},
       |d2 AS (
       |  SELECT n.vec_id, n.em, n.nrm, c2.cid,
       |    n.nrm + c2.cnrm - 2 * CAST(list_sum(
       |      list_transform(generate_series(1, len(n.em)),
       |        i -> n.em[i] * c2.cm[i])) AS BIGINT) AS dd
       |  FROM n, c2
       |), asg AS (
       |  SELECT vec_id, em, nrm, cid FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY dd, cid) AS rn FROM d2)
       |  WHERE rn = 1
       |), sizes AS (
       |  SELECT cid, CAST(count(*) AS BIGINT) AS n_cluster
       |  FROM asg GROUP BY cid
       |), dups AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM asg a JOIN asg b
       |    ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE CAST(list_sum(list_transform(generate_series(1, len(a.em)),
       |          i -> a.em[i] * b.em[i])) AS DOUBLE)
       |      / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE)))
       |      >= $gatedTau
       |)
       |SELECT a.vec_id, a.cid AS cluster, s.n_cluster,
       |  d.vec_id IS NOT NULL AS is_dup
       |FROM asg a
       |JOIN sizes s ON s.cid = a.cid
       |LEFT JOIN dups d ON d.vec_id = a.vec_id""".stripMargin
}
