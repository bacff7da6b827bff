package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Memorization audit — "how much of this model output is verbatim
  * training data?" (Carlini et al., "Quantifying Memorization Across
  * Neural Language Models", arXiv:2202.07646: a span is memorized when
  * a k-token window reappears verbatim in the training set; the
  * eval-side twin of [[graft.dedup.Decontaminate]], which asks the
  * mirror question before training). Per generation: the fraction of
  * its token k-gram windows found verbatim in the corpus, in exact
  * permille.
  *
  * Relational shape: both sides explode to k-gram window strings; the
  * corpus side is DISTINCT (set semantics); one left-semi-shaped join
  * on the window marks hits — linear in token volume, never
  * per-generation corpus scans. At 100 TB the window key would be an
  * xxhash64 of the joined tokens (8-byte shuffle rows instead of
  * strings, the [[graft.dedup.SubstringDedup]] note); the gate keeps
  * the exact string so the oracle is byte-honest.
  */
object MemorizationAudit {

  /** Pooled audit per generation class: (gen_class, n_gens, n_windows,
    * n_hits, hit_permille). `genToks`/generation id in `gens`;
    * `corpusToks` on the corpus frame. Generations shorter than k
    * contribute zero windows. */
  def audit(gens: DataFrame, idCol: String, classCol: String,
            genToks: Column, corpus: DataFrame, corpusToks: Column,
            k: Int): DataFrame = {
    require(k >= 2)
    // windows over the NORMALIZED column name — interpolating a Column
    // expression string into expr() is not round-trippable
    val winExpr: Column =
      when(size(col("__toks")) >= k,
        expr(s"transform(sequence(1, size(__toks) - ${k - 1}), " +
          s"i -> array_join(slice(__toks, i, $k), ' '))"))
        .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
    val corpusGrams = corpus.select(corpusToks.as("__toks"))
      .select(explode(winExpr).as("__w"))
      .distinct()
    val genWindows = gens.select(col(idCol).as("__id"),
      col(classCol).as("gen_class"), genToks.as("__toks"))
      .select(col("__id"), col("gen_class"),
        explode_outer(winExpr).as("__w"))
    val hits = genWindows.filter(col("__w").isNotNull)
      .join(corpusGrams.withColumn("__hit", lit(1)), Seq("__w"), "left")
      .groupBy("__id", "gen_class")
      .agg(count(lit(1)).as("__nw"),
        sum(coalesce(col("__hit"), lit(0))).as("__nh"))
    // explode_outer keeps zero-window generations as one null row;
    // count them with zero windows
    val zeros = genWindows.filter(col("__w").isNull)
      .select(col("__id"), col("gen_class"),
        lit(0L).as("__nw"), lit(0L).as("__nh"))
    hits.unionByName(zeros)
      .groupBy("gen_class")
      .agg(count(lit(1)).as("n_gens"),
        sum("__nw").as("n_windows"),
        sum("__nh").as("n_hits"))
      .withColumn("hit_permille",
        when(col("n_windows") > 0,
          expr("(1000 * n_hits) div n_windows")).otherwise(lit(0L)))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance (k = 5 token windows over the documents corpus):
    * three planted generation classes — `verbatim` (the first 30
    * corpus tokens of the doc: every window must hit), `mixed` (15
    * corpus tokens + 15 guaranteed-novel tokens: only the pure-corpus
    * prefix windows hit), `novel` (30 synthetic tokens: zero hits). */
  def memorizationDocs(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(lower(col("text")), "\\s+")
    val corpus = Tables.documents(spark, dir).select(toks.as("toks"))
    val gens = Tables.documents(spark, dir).select(col("doc_id"),
      toks.as("toks"))
      .withColumn("novel", expr(
        "transform(sequence(1, 15), i -> concat('nv', doc_id, '_', i))"))
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit("verbatim"))
          .when(pmod(col("doc_id"), lit(3)) === 1, lit("mixed"))
          .otherwise(lit("novel")).as("gen_class"),
        expr("""CASE
          | WHEN doc_id % 3 = 0 THEN slice(toks, 1, least(30, size(toks)))
          | WHEN doc_id % 3 = 1 THEN concat(
          |   slice(toks, 1, least(15, size(toks))), novel)
          | ELSE concat(novel, novel) END""".stripMargin).as("gen_toks"))
    audit(gens, "doc_id", "gen_class", col("gen_toks"),
      corpus, col("toks"), k = 5)
  }

  def oracleSql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      |  FROM documents
      |), cg AS (
      |  SELECT DISTINCT w FROM (
      |    SELECT unnest(CASE WHEN len(toks) >= 5
      |      THEN [array_to_string(list_slice(toks, i, i + 4), ' ')
      |            FOR i IN range(1, len(toks) - 3)]
      |      ELSE [] END) AS w
      |    FROM d)
      |), g AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'verbatim'
      |         WHEN doc_id % 3 = 1 THEN 'mixed'
      |         ELSE 'novel' END AS gen_class,
      |    CASE WHEN doc_id % 3 = 0
      |           THEN list_slice(toks, 1, least(30, len(toks)))
      |         WHEN doc_id % 3 = 1 THEN list_concat(
      |           list_slice(toks, 1, least(15, len(toks))),
      |           [concat('nv', doc_id, '_', i) FOR i IN range(1, 16)])
      |         ELSE list_concat(
      |           [concat('nv', doc_id, '_', i) FOR i IN range(1, 16)],
      |           [concat('nv', doc_id, '_', i) FOR i IN range(1, 16)])
      |    END AS gen_toks
      |  FROM d
      |), gw AS (
      |  SELECT doc_id, gen_class,
      |    CASE WHEN len(gen_toks) >= 5
      |      THEN [array_to_string(list_slice(gen_toks, i, i + 4), ' ')
      |            FOR i IN range(1, len(gen_toks) - 3)]
      |      ELSE [] END AS ws
      |  FROM g
      |), gx AS (
      |  SELECT doc_id, gen_class, unnest(ws) AS w FROM gw
      |), per AS (
      |  SELECT gx.doc_id, gx.gen_class,
      |    CAST(count(*) AS BIGINT) AS nw,
      |    CAST(sum(CASE WHEN cg.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nh
      |  FROM gx LEFT JOIN cg ON cg.w = gx.w
      |  GROUP BY 1, 2
      |), allg AS (
      |  SELECT gw.doc_id, gw.gen_class,
      |    coalesce(p.nw, 0) AS nw, coalesce(p.nh, 0) AS nh
      |  FROM gw LEFT JOIN per p USING (doc_id, gen_class)
      |)
      |SELECT gen_class, CAST(count(*) AS BIGINT) AS n_gens,
      |  CAST(sum(nw) AS BIGINT) AS n_windows,
      |  CAST(sum(nh) AS BIGINT) AS n_hits,
      |  CAST(CASE WHEN sum(nw) > 0
      |    THEN (1000 * sum(nh)) // sum(nw) ELSE 0 END AS BIGINT)
      |    AS hit_permille
      |FROM allg GROUP BY gen_class""".stripMargin
}
