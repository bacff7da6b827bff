package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Exact n-gram (word-shingle) Jaccard similarity join with prefix-filter
  * candidate generation — near-duplicate pair detection with a
  * guaranteed-recall, linear-scale candidate step (the PPJoin/AllPairs
  * family of set-similarity joins, not probabilistic LSH).
  *
  * Why it scales: for Jaccard ≥ t, two shingle sets must share at least
  * one element among the first `|S| - ceil(t·|S|) + 1` elements of each
  * set under ANY fixed total order; and their sizes must satisfy
  * t·|a| ≤ |b| ≤ |a|/t. We hash every shingle to a long ONCE and order
  * prefixes by ASCENDING GLOBAL DOCUMENT FREQUENCY (the AllPairs/PPJoin
  * discipline): candidate pairs form only on each document's RAREST
  * shingles, so the candidate count per shingle is O(df²) on rare tokens
  * instead of on stop-phrase shingles — the difference between linear
  * and quadratic when a corpus shares boilerplate. The frequency table
  * is one count aggregation over (shingle, doc) postings — a shuffle of
  * 8-byte keys, linear in corpus size. Exact Jaccard verification
  * intersects the hashed-shingle arrays only for candidates, so output =
  * ground truth at any scale (a cross-doc 64-bit hash collision would
  * take ~10¹⁹ comparisons to matter).
  *
  * Everything after the one text→hashes pass operates on long arrays:
  * natural-order sort (codegen'd), 8-byte shuffle keys, long-array
  * intersects — no interpreted string lambdas in the hot path.
  */
object NGramJaccard {

  /** Distinct word-trigram shingles of a text column (string form —
    * shared with MinHashLsh, which signs the same shingle sets).
    *
    * Built with `zip_with` over three shifted slices rather than
    * `element_at(ws, i)` inside a `transform` lambda: higher-order
    * lambdas evaluate interpreted, and a non-bound child like the regex
    * split would re-run PER ELEMENT (three full-text splits per shingle);
    * zip_with's array arguments evaluate once per row. */
  def shingles(text: Column): Column = {
    def trigrams(t: Column): Column = {
      val ws = split(t, "\\s+")
      val n = size(ws) - 2
      zip_with(
        zip_with(slice(ws, lit(1), n), slice(ws, lit(2), n), (x, y) => concat_ws(" ", x, y)),
        slice(ws, lit(3), n),
        (xy, z) => concat_ws(" ", xy, z))
    }
    array_distinct(
      when(size(split(text, "\\s+")) >= 3, trigrams(text))
        .otherwise(array().cast("array<string>")))
  }

  /** Distinct shingles hashed to longs, sorted ascending — the compact
    * form every downstream step (prefix, join, verify) runs on. */
  def hashedShingles(text: Column): Column =
    array_sort(transform(shingles(text), s => xxhash64(s)))

  /** Verified similarity pairs (a_id < b_id) with Jaccard ≥ threshold.
    *
    * Exact-dup-collapse discipline (the [[SimHashDedup]] move): the
    * prefix machinery, candidate join, and verification all run over
    * DISTINCT shingle SETS, never per document — identical texts are
    * ubiquitous at corpus scale (the r16 100×-replica run, 100 copies
    * per text, OOM'd the per-doc prefix self-join on the m²·prefixLen
    * within-cluster blowup). Member expansion happens only at OUTPUT:
    * cross-set pairs inherit the set pair's verified (n_common,
    * jaccard); within-set pairs are jaccard-1 by construction. Pair
    * output for an m-sized identical cluster is still m(m−1)/2 —
    * intrinsic to the pair contract; component-style callers should
    * use rep assignment instead. */
  def similarPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double): DataFrame = {
    // one pass computes the hashed shingle sets, materialized once since
    // the set collapse and the member expansion both read it.
    val sh = docs.select(col(idCol).as("__id"), hashedShingles(col(textCol)).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .localCheckpoint()
    // one row per DISTINCT set, keyed by the set itself (exact — a hash
    // key would merge colliding sets); __sid = min member id
    val sets = sh.groupBy(col("__sh"))
      .agg(min(col("__id")).as("__sid"), count(lit(1)).as("__m"))
      .withColumn("__n", size(col("__sh")))
      .localCheckpoint()

    // global shingle SET-frequencies; re-sort each set's shingles
    // rarest-first and take the prefix from that order
    val ex = sets.select(col("__sid"), col("__n"), explode(col("__sh")).as("__tok"))
    val tokDf = ex.groupBy("__tok").agg(count(lit(1)).as("__df"))
    val prefixLen = (col("__n") - ceil(lit(threshold) * col("__n")) + 1).cast("int")
    val prefixes = ex.join(tokDf, "__tok")
      .groupBy("__sid")
      .agg(max("__n").as("__n"),
        sort_array(collect_list(struct(col("__df"), col("__tok")))).as("__ord"))
      .select(col("__sid"), col("__n"),
        explode(slice(transform(col("__ord"), s => s.getField("__tok")),
          lit(1), prefixLen)).as("__tok"))

    // size-compatibility prunes pairs the verify step would reject anyway
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.__tok") === col("b.__tok") && col("a.__sid") < col("b.__sid") &&
          col("b.__n") * lit(threshold) <= col("a.__n") &&
          col("a.__n") * lit(threshold) <= col("b.__n"))
      .select(col("a.__sid").as("__sa"), col("b.__sid").as("__sb"))
      .distinct()

    val verified = cand
      .join(sets.select(col("__sid").as("__sa"), col("__sh").as("__sha")), "__sa")
      .join(sets.select(col("__sid").as("__sb"), col("__sh").as("__shb")), "__sb")
      .withColumn("n_common",
        size(array_intersect(col("__sha"), col("__shb"))).cast("int"))
      .withColumn("jaccard",
        col("n_common").cast("double")
          / (size(col("__sha")) + size(col("__shb")) - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("__sa"), col("__sb"), col("n_common"), col("jaccard"))
      .localCheckpoint() // expanded by the member join below

    // membership (set rep -> doc id); cross-set expansion re-normalizes
    // the id order since members interleave across sets
    val mem = sh.join(sets.select(col("__sh"), col("__sid")), Seq("__sh"))
      .select(col("__sid"), col("__id"))
    val cross = verified
      .join(mem.select(col("__sid").as("__sa"), col("__id").as("__ida")), "__sa")
      .join(mem.select(col("__sid").as("__sb"), col("__id").as("__idb")), "__sb")
      .select(least(col("__ida"), col("__idb")).as("a_id"),
        greatest(col("__ida"), col("__idb")).as("b_id"),
        col("n_common"), col("jaccard"))
    // identical sets: every member pair is jaccard 1 (n_common = |set|)
    val within = mem.as("a").join(mem.as("b"),
        col("a.__sid") === col("b.__sid") && col("a.__id") < col("b.__id"))
      .join(sets.select(col("__sid").as("__ws"), col("__n")),
        col("a.__sid") === col("__ws"))
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
        col("__n").cast("int").as("n_common"), lit(1.0).as("jaccard"))
    cross.unionByName(within)
  }

  // ---- query-map entry (#30) ----

  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    similarPairs(Tables.documents(spark, dir), "doc_id", "text", threshold = 0.5)

  /** Oracle is the all-pairs ground truth — valid at sf scale; the Spark
    * side must agree exactly because prefix filtering has perfect recall. */
  def oracleSql: String =
    """WITH sh AS (
      |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ws)-2),
      |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) sg
      |  FROM (SELECT doc_id, string_split_regex(text, '\s+') ws FROM documents)
      |  WHERE len(ws) >= 3
      |)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  CAST(len(list_intersect(a.sg, b.sg)) AS INT) AS n_common,
      |  CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
      |    / (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE)
      |    / (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) >= 0.5""".stripMargin

  /** DIRECTIONAL containment pairs: C(A→B) = |sh(A) ∩ sh(B)| / |sh(A)| ≥
    * t‰ — the asymmetric near-dup relation Jaccard misses: a fragment
    * inside a much longer page has tiny Jaccard but containment ≈ 1.
    * The unordered generalization of [[PrefixDedup]] (which catches only
    * contiguous head truncations).
    *
    * Candidates come from a shared-rare-shingle postings join with a
    * DOCUMENT-FREQUENCY CAP: shingles appearing in more than `dfCap`
    * docs are dropped from candidate generation (stop-shingle removal —
    * the boilerplate phrases that would otherwise quadratically blow up
    * the posting self-join). That bounds per-shingle join work to dfCap²
    * — linear overall — at a DECLARED recall bound: a pair sharing ONLY
    * ultra-common shingles is not surfaced (such pairs are boilerplate
    * overlap, not containment, at any realistic cap). Verification
    * intersects the FULL shingle sets, so surfaced pairs carry exact
    * counts. Threshold compare and permille are integer-exact.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       thresholdPermille: Int, dfCap: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"), hashedShingles(col(textCol)).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .localCheckpoint()
    val ex = sh.select(col("__id"), explode(col("__sh")).as("__tok"))
    val rareTok = ex.groupBy("__tok").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= dfCap)
    val rare = ex.join(rareTok.select("__tok"), "__tok")
    val cand = rare.as("a").join(rare.as("b"),
        col("a.__tok") === col("b.__tok") && col("a.__id") =!= col("b.__id"))
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"))
      .distinct()
    cand
      .join(sh.select(col("__id").as("a_id"), col("__sh").as("__sha")), "a_id")
      .join(sh.select(col("__id").as("b_id"), col("__sh").as("__shb")), "b_id")
      .withColumn("n_common", size(array_intersect(col("__sha"), col("__shb"))))
      .withColumn("n_a", size(col("__sha")))
      .filter(col("n_common") * 1000 >= col("n_a") * thresholdPermille)
      .select(col("a_id"), col("b_id"), col("n_common").cast("long").as("n_common"),
        col("n_a").cast("long").as("n_a"),
        expr("(1000 * CAST(n_common AS BIGINT)) div n_a").as("containment_permille"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: containment ≥ 60% over the corpus plus the SAME
    * planted half-text truncations [[PrefixDedup]] injects (id+10⁹,
    * every 10th doc) — each plant is contained in its source, so the
    * directional output is non-degenerate by construction. */
  def containmentDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val planted = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        expr("substr(text, 1, length(text) div 2)").as("text"))
      .filter(length(col("text")) >= 1)
    containmentPairs(docs.unionByName(planted), "doc_id", "text",
      thresholdPermille = 600, dfCap = 50)
  }

  def containmentOracleSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000000, substr(text, 1, length(text) // 2)
      |  FROM documents
      |  WHERE doc_id % 10 = 0 AND length(text) // 2 >= 1
      |), sh AS (
      |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ws)-2),
      |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) sg
      |  FROM (SELECT doc_id, string_split_regex(text, '\s+') ws FROM corpus)
      |  WHERE len(ws) >= 3
      |), ex AS (
      |  SELECT doc_id, unnest(sg) AS tok FROM sh
      |), rare AS (
      |  SELECT tok FROM ex GROUP BY tok HAVING count(*) <= 50
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM ex a JOIN rare USING (tok) JOIN ex b USING (tok)
      |  WHERE a.doc_id <> b.doc_id
      |), scored AS (
      |  SELECT c.a_id, c.b_id,
      |    CAST(len(list_intersect(sa.sg, sb.sg)) AS BIGINT) AS n_common,
      |    CAST(len(sa.sg) AS BIGINT) AS n_a
      |  FROM cand c
      |  JOIN sh sa ON sa.doc_id = c.a_id
      |  JOIN sh sb ON sb.doc_id = c.b_id
      |)
      |SELECT a_id, b_id, n_common, n_a,
      |  (1000 * n_common) // n_a AS containment_permille
      |FROM scored
      |WHERE 1000 * n_common >= 600 * n_a""".stripMargin
}
