package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Embedding-cosine near-duplicate pairs above a similarity threshold.
  *
  * This is the exact ("flat index") verification baseline — the
  * counterpart of the reference's FAISS flat index
  * (/root/reference/MachineLearning/ML/performant_faiss.py:7-10); the
  * linear-scale candidate path over the same vectors is the
  * random-hyperplane bucketing in `graft.ann.LshAnn` (the IVF
  * counterpart). Exact threshold joins over cosine have no
  * recall-guaranteed bucketing, so the exhaustive pass stays the ground
  * truth and the LSH path is the 100 TB route.
  *
  * Cross-engine determinism: vectors are quantized to integers
  * (floor(x·1000)), so dot products and norms are exact integer
  * arithmetic and the final cosine is bit-identical in any engine —
  * float-sum association order can never flap the oracle hash.
  */
object EmbeddingDedup {
  import graft.functions.VectorFunctions.{cosineQ, quantize}

  /** All pairs (a_id < b_id) with cosine ≥ threshold — exact.
    *
    * Each vector's norm is computed once up front (not per pair — that
    * would triple the dominant cost), and the streamed side of the
    * nested-loop pair join is spread across the session's shuffle
    * parallelism so a single-file input can't serialize the O(n²/2)
    * verification onto one task. */
  def similarPairs(vecs: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val parallelism = vecs.sparkSession.sessionState.conf.numShufflePartitions
    val q = vecs.select(col(idCol).as("__id"), quantize(col(vecCol)).as("__q"))
      .withColumn("__norm", sqrt(graft.functions.VectorFunctions.dotQ(col("__q"), col("__q")).cast("double")))
    // unconditional: shuffling n quantized vectors is noise next to the
    // O(n²) verification the spread enables, and a conditional
    // rdd.getNumPartitions check would instantiate the physical plan a
    // second time per query
    val streamed = q.repartition(parallelism)
    streamed.as("a")
      .join(q.as("b"), col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
        (graft.functions.VectorFunctions.dotQ(col("a.__q"), col("b.__q")).cast("double")
          / (col("a.__norm") * col("b.__norm"))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** The 100 TB route: candidate pairs from LSH bucket collisions
    * ([[graft.ann.LshAnn.postings]] — linear index, uniform join keys),
    * exact quantized-cosine verification only within buckets. Output ⊆
    * the exact pairs; for true near-duplicates (cos ≥ 0.9) a bucket
    * collision happens in some table with p ≈ 0.998 at the default
    * 12-table/6-bit config, so dedup recall is effectively total while
    * candidate volume stays linear in corpus size. */
  def similarPairsApprox(vecs: DataFrame, idCol: String, vecCol: String,
                         threshold: Double,
                         tables: Int = graft.ann.LshAnn.Tables_,
                         bits: Int = graft.ann.LshAnn.Bits): DataFrame = {
    val post = graft.ann.LshAnn.postings(vecs, idCol, vecCol, tables, bits)
    val cand = post.as("a").join(post.as("b"),
        col("a.table_idx") === col("b.table_idx") &&
          col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"))
      .distinct()
    val q = vecs.select(col(idCol).as("__id"), quantize(col(vecCol)).as("__q"))
      .withColumn("__norm",
        sqrt(graft.functions.VectorFunctions.dotQ(col("__q"), col("__q")).cast("double")))
    cand
      .join(q.select(col("__id").as("a_id"), col("__q").as("__qa"), col("__norm").as("__na")), "a_id")
      .join(q.select(col("__id").as("b_id"), col("__q").as("__qb"), col("__norm").as("__nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        (graft.functions.VectorFunctions.dotQ(col("__qa"), col("__qb")).cast("double")
          / (col("__na") * col("__nb"))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  // ---- query-map entry (#31) ----

  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    similarPairs(Tables.embeddings(spark, dir), "vec_id", "embedding", threshold = 0.4)

  /** The 100 TB route as its own driver-gated key (rows-gated: LSH
    * candidate generation is probabilistic; output ⊆ exact is asserted in
    * DedupSpec together with total recall on planted near-dups). */
  def dedupEmbeddingApprox(spark: SparkSession, dir: String): DataFrame =
    similarPairsApprox(Tables.embeddings(spark, dir), "vec_id", "embedding", threshold = 0.4)

  /** Degeneracy gate (the ann_*_exhaustive trick applied to the dedup
    * path): 1 table × 0 hyperplane bits puts every vector in ONE bucket,
    * so the LSH candidate machinery (posting explode, bucket self-join,
    * distinct, verify join-back) degenerates to all-pairs exact — and
    * must be bit-identical to [[similarPairs]], whose DuckDB oracle it
    * therefore shares. Hash-gates the approximate pipeline itself; the
    * probed `dedup_embedding_approx` stays the declared scale path. */
  def dedupEmbeddingExhaustive(spark: SparkSession, dir: String): DataFrame =
    similarPairsApprox(Tables.embeddings(spark, dir), "vec_id", "embedding",
      threshold = 0.4, tables = 1, bits = 0)

  def oracleSql: String =
    """WITH q AS (
      |  SELECT vec_id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT)) qe
      |  FROM embeddings
      |)
      |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |  list_inner_product(a.qe, b.qe)
      |    / (sqrt(list_inner_product(a.qe, a.qe)) * sqrt(list_inner_product(b.qe, b.qe))) AS cos_sim
      |FROM q a JOIN q b ON a.vec_id < b.vec_id
      |WHERE list_inner_product(a.qe, b.qe)
      |    / (sqrt(list_inner_product(a.qe, a.qe)) * sqrt(list_inner_product(b.qe, b.qe))) >= 0.4""".stripMargin
}
