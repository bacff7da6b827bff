package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Reciprocal Rank Fusion — the standard hybrid-retrieval combiner
  * (lexical BM25 list ⊕ dense ANN list → one ranking; Cormack et al.'s
  * RRF). The reference retrieves by dense similarity alone
  * (/root/reference/MachineLearning/ML/performant_faiss.py); production
  * RAG stacks fuse that with a lexical ranker, and this operator is
  * that fusion step over any two orderings.
  *
  * Exactness: ranks come from [[Ranks.globalRowNumber]] (scalable
  * two-phase global rank, total orders via explicit tie-break columns),
  * and the RRF score is computed ENTIRELY in integer arithmetic —
  * `1_000_000 DIV (k + rank)` per list, summed as BIGINT — so no float
  * ever enters and the hash gate is trivial. (The classic 1/(k+r) is a
  * monotone transform of this micros-truncated form at equal k; ties
  * the truncation introduces are broken by id, deterministically.)
  *
  * Scale: two global ranks (each a range-repartition + per-partition
  * window + broadcast offset join), one narrow (id, rank) join, one
  * final rank — no corpus-wide single-partition window anywhere.
  */
object RankFusion {

  /** Fuse two orderings of `df`: (id, rank_a, rank_b, rrf_micros,
    * fused_rank). `orderA`/`orderB` MUST be total orders (append the id
    * as tie-break). */
  def rrf(df: DataFrame, idCol: String, orderA: Seq[Column],
          orderB: Seq[Column], k: Int = 60): DataFrame = {
    require(k >= 1, "rrf k must be positive")
    val ra = Ranks.globalRowNumber(df, orderA, "rank_a")
      .select(col(idCol), col("rank_a"))
    val rb = Ranks.globalRowNumber(df, orderB, "rank_b")
      .select(col(idCol), col("rank_b"))
    val scored = ra.join(rb, idCol)
      .withColumn("rrf_micros",
        expr(s"1000000L DIV ($k + rank_a) + 1000000L DIV ($k + rank_b)"))
    Ranks.globalRowNumber(scored,
        Seq(col("rrf_micros").desc, col(idCol)), "fused_rank")
      .select(idCol, "rank_a", "rank_b", "rrf_micros", "fused_rank")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: fuse a length ranker with a deterministic-hash
    * ranker over the documents (placeholder signals — the operator under
    * test is the fusion; swap in bm25_topk / ann scores in real use). */
  def rrfDocs(spark: SparkSession, dir: String): DataFrame =
    rrf(Tables.documents(spark, dir).select("doc_id", "text"), "doc_id",
      Seq(length(col("text")).desc, col("doc_id")),
      Seq(Sampling.portableBucket(col("doc_id")), col("doc_id")))
      .filter(col("fused_rank") <= 100)

  def oracleSql: String =
    """WITH r AS (
      |  SELECT doc_id,
      |    row_number() OVER (ORDER BY length(text) DESC, doc_id) AS rank_a,
      |    row_number() OVER (ORDER BY
      |      (((doc_id % 100003) * 1103515245 + 12345) % 1000000 + 1000000)
      |        % 1000000, doc_id) AS rank_b
      |  FROM documents
      |), s AS (
      |  SELECT doc_id, CAST(rank_a AS BIGINT) AS rank_a,
      |    CAST(rank_b AS BIGINT) AS rank_b,
      |    CAST(1000000 // (60 + rank_a) + 1000000 // (60 + rank_b) AS BIGINT)
      |      AS rrf_micros
      |  FROM r
      |)
      |SELECT doc_id, rank_a, rank_b, rrf_micros,
      |  CAST(row_number() OVER (ORDER BY rrf_micros DESC, doc_id) AS BIGINT)
      |    AS fused_rank
      |FROM s
      |QUALIFY fused_rank <= 100""".stripMargin
}
