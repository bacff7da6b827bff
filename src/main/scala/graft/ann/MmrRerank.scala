package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.{dotQ, quantize}

/** Maximal Marginal Relevance re-ranking — the diversification step a
  * retrieval stack runs AFTER the ANN/BM25 candidates come back
  * (Carbonell & Goldstein; the reference's RAG-style retrieval,
  * /root/reference/MachineLearning/NLP/ray_batch_embedding_generator.py
  * embeddings feeding a retriever): greedily pick the candidate
  * maximizing λ·rel − (1−λ)·max_{j∈picked} sim, trading relevance
  * against redundancy with what is already selected.
  *
  * λ = ½ (dyadic) makes the doubled score EXACTLY rel − maxsim in raw
  * integer dot-product units (milli-quantized embeddings through the
  * codegen'd [[graft.functions.LongArrayDot]]) — no float anywhere.
  * The greedy recursion is a k-step `aggregate` fold over the
  * COLLECTED candidate frame (service semantics: candidates are a
  * bounded re-rank window, here 20, never the corpus — the
  * ann_sparse_bow lesson), with (score DESC, id ASC) total-order
  * picks; the DuckDB oracle replays the same recursion as a recursive
  * CTE carrying the picked-id list. First pick is pure relevance
  * (max-over-empty = 0 by convention, stated).
  */
object MmrRerank {

  /** Greedy MMR over bounded candidates: (rank, vec_id, mmr_score2) —
    * score2 = 2·MMR score at λ = ½, integer dot units. */
  def rerank(cands: DataFrame, probe: DataFrame, idCol: String,
             vecCol: String, k: Int): DataFrame = {
    val c = cands.select(col(idCol).cast("long").as("id"),
      quantize(col(vecCol)).as("q"))
    val p = probe.select(quantize(col(vecCol)).as("pq"))
    val rel = c.crossJoin(broadcast(p))
      .select(col("id"), dotQ(col("q"), col("pq")).as("rel"))
    val sims = c.as("a").join(c.as("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"),
        dotQ(col("a.q"), col("b.q")).as("s"))
    val gathered = rel.agg(
        expr("sort_array(collect_list(struct(id, rel)))").as("cs"))
      .crossJoin(broadcast(
        sims.agg(expr("collect_list(struct(i, j, s))").as("ss"))))
    // the pick expression (argmax by score DESC, id ASC over remaining);
    // SQL lambdas have no let-binding, so it appears once per use
    val pick =
      """element_at(array_sort(
        |  transform(filter(cs, c -> NOT array_contains(st.sel, c.id)),
        |    c -> named_struct(
        |      'score', c.rel - coalesce(array_max(
        |         transform(filter(ss, p -> p.i = c.id
        |                     AND array_contains(st.sel, p.j)),
        |           p -> p.s)), 0L),
        |      'id', c.id)),
        |  (l, r) -> CASE WHEN l.score > r.score THEN -1
        |                 WHEN l.score < r.score THEN 1
        |                 WHEN l.id < r.id THEN -1 ELSE 1 END), 1)""".stripMargin
    gathered.select(explode(expr(
      s"""aggregate(sequence(1, $k),
         |  named_struct('sel', CAST(array() AS ARRAY<BIGINT>),
         |    'out', CAST(array() AS ARRAY<STRUCT<rank: INT, vec_id: BIGINT,
         |      mmr_score2: BIGINT>>)),
         |  (st, step) -> named_struct(
         |    'sel', concat(st.sel, array(($pick).id)),
         |    'out', concat(st.out, array(named_struct(
         |      'rank', step, 'vec_id', ($pick).id,
         |      'mmr_score2', ($pick).score)))),
         |  st -> st.out)""".stripMargin)).as("r"))
      .select(col("r.rank"), col("r.vec_id"), col("r.mmr_score2"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: re-rank the 20 lowest-id embeddings against the
    * vec_id = 100 probe, k = 5. */
  def mmrEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
    rerank(vecs.filter(col("vec_id") < 20), vecs.filter(col("vec_id") === 100),
      "vec_id", "embedding", k = 5)
  }

  /** The pick expression as DuckDB list algebra: struct sort keys make
    * (score DESC, id ASC) one ascending list_sort — no subquery, no
    * lateral, so the recursive CTE stays within DuckDB's correlation
    * rules (no let-binding in SQL: it appears once per use). */
  private def duckPick(picked: String): String =
    s"""list_sort(list_transform(
       |      list_filter(a.cs, c -> NOT list_contains($picked, c.id)),
       |      c -> struct_pack(k := -(c.rel - coalesce(list_max(list_transform(
       |          list_filter(c.sims, p -> list_contains($picked, p.j)),
       |          p -> p.s)), 0)),
       |        id := c.id,
       |        score := c.rel - coalesce(list_max(list_transform(
       |          list_filter(c.sims, p -> list_contains($picked, p.j)),
       |          p -> p.s)), 0))))[1]""".stripMargin

  def oracleSql: String = {
    val p0 = duckPick("[]::BIGINT[]")
    val pr = duckPick("s.picked")
    s"""WITH RECURSIVE q AS (
      |  SELECT vec_id AS id,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS qe
      |  FROM embeddings WHERE vec_id < 20
      |), probe AS (
      |  SELECT list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT)) AS pq
      |  FROM embeddings WHERE vec_id = 100
      |), rel AS (
      |  SELECT q.id, list_inner_product(q.qe, p.pq) AS rel
      |  FROM q CROSS JOIN probe p
      |), simlist AS (
      |  SELECT a.id AS i, list(struct_pack(j := b.id,
      |    s := list_inner_product(a.qe, b.qe))) AS sims
      |  FROM q a JOIN q b ON a.id <> b.id GROUP BY 1
      |), allc AS (
      |  SELECT list(struct_pack(id := r.id, rel := r.rel, sims := s.sims)) AS cs
      |  FROM rel r JOIN simlist s ON r.id = s.i
      |), sel AS (
      |  SELECT 1 AS rank, ($p0).id AS id, ($p0).score AS score,
      |    [($p0).id] AS picked
      |  FROM allc a
      |  UNION ALL
      |  SELECT s.rank + 1, ($pr).id, ($pr).score,
      |    list_append(s.picked, ($pr).id)
      |  FROM sel s, allc a WHERE s.rank < 5
      |)
      |SELECT CAST(rank AS INT) AS rank, CAST(id AS BIGINT) AS vec_id,
      |  CAST(score AS BIGINT) AS mmr_score2
      |FROM sel""".stripMargin
  }
}
