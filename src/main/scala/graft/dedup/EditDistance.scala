package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Edit-distance similarity join with pigeonhole blocking and a
  * DECLARED hot-block cap: document pairs whose fixed-length key
  * prefixes are within Levenshtein distance 1 — fuzzy record linkage
  * over titles/keys, the string-metric sibling of [[SimHashDedup]]'s
  * hamming-band scheme.
  *
  * Blocking argument: two EQUAL-LENGTH strings at distance ≤ 1 differ by
  * at most one SUBSTITUTION (an insert/delete would change length), and
  * one substitution touches exactly one half — so the pair agrees exactly
  * on the first half OR the last half of the prefix. Two equi-joins (one
  * per half) therefore reach every true pair; `levenshtein()` verifies
  * candidates exactly. This is the q-gram/pigeonhole discipline from the
  * set-similarity-join literature restated for edit distance, and it
  * scales like any equi-join: 8-char bucket keys shuffle, candidates are
  * verified in place, nothing quadratic ever crosses the wire.
  *
  * Hot-block cap (the [[NGramJaccard.containmentPairs]] dfCap
  * discipline): a half-prefix shared by more than `blockCap` documents
  * (boilerplate openings — "Subject: RE:", shared templates) would make
  * its bucket's self-join quadratic in the block size, the one spot
  * where the equi-join shape breaks at corpus scale. Such blocks are
  * DROPPED from candidate generation, bounding per-block join work to
  * blockCap² — linear overall — at a DECLARED recall bound: a true
  * pair is missed when EVERY half-prefix block the two prefixes agree
  * on is hot. Identical prefixes (distance 0) agree on both halves and
  * need both hot to be lost; a one-substitution pair agrees on only
  * ONE half, so a single hot boilerplate half loses it — the price of
  * the cap, exercised by HotBlockSpec's hot-only-pair case. Surfaced
  * pairs are still exactly verified. The gated oracle mirrors the
  * capped candidate structure, so the contract (not just the happy
  * path) is hash-gated.
  */
object EditDistance {

  /** Candidate id pairs (pre-verification, deduped) from the capped
    * half-prefix blocking — exposed so specs can assert the candidate
    * volume the blocking admits, separately from recall. Columns:
    * (a_id, b_id, __pa, __pb). */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     prefixLen: Int = 16, blockCap: Int = 1000): DataFrame = {
    require(prefixLen >= 2, "prefix must split into two non-empty halves")
    require(blockCap >= 1, "blockCap must be positive")
    val half = prefixLen / 2
    val p = docs
      .select(col(idCol).as("__id"), substring(col(textCol), 1, prefixLen).as("__p"))
      .filter(length(col("__p")) === prefixLen)
    val first = p.withColumn("__b", substring(col("__p"), 1, half))
    val second = p.withColumn("__b", substring(col("__p"), half + 1, prefixLen - half))
    def candidates(side: DataFrame): DataFrame = {
      // df-cap: blocks larger than blockCap never enter the self-join
      val hot = side.groupBy(col("__b"))
        .agg(count(lit(1)).as("__df")).filter(col("__df") > blockCap)
      val kept = side.join(hot.select("__b"), Seq("__b"), "left_anti")
      kept.as("a").join(kept.as("b"),
          col("a.__b") === col("b.__b") && col("a.__id") < col("b.__id"))
        .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
          col("a.__p").as("__pa"), col("b.__p").as("__pb"))
    }
    candidates(first).unionByName(candidates(second)).distinct()
  }

  /** (a_id, b_id, lev) for pairs with levenshtein(prefix_a, prefix_b) ≤ 1
    * over `prefixLen`-char prefixes; rows shorter than `prefixLen` are
    * excluded (a length mismatch > 1 can never be within distance 1 of a
    * full-length prefix anyway, and equal lengths make the pigeonhole
    * argument airtight). Recall bound: a pair is surfaced only through
    * a half-prefix block the two AGREE on that is not hot — distance-1
    * pairs have exactly one such block, so one hot half loses them
    * (see object doc). */
  def nearPairs(docs: DataFrame, idCol: String, textCol: String,
                prefixLen: Int = 16, blockCap: Int = 1000): DataFrame =
    candidatePairs(docs, idCol, textCol, prefixLen, blockCap)
      .withColumn("lev", levenshtein(col("__pa"), col("__pb")))
      .filter(col("lev") <= 1)
      .select("a_id", "b_id", "lev")

  // ---- query-map entry (hash-gated vs DuckDB's levenshtein) ----

  def editdistPairs(spark: SparkSession, dir: String): DataFrame =
    nearPairs(Tables.documents(spark, dir), "doc_id", "text")

  /** The oracle mirrors the CAPPED candidate structure exactly (blocks,
    * df-cap, union-dedup, verify) — the declared-recall contract is what
    * the gate checks, not an uncapped all-pairs idealization. */
  def oracleSql: String =
    """WITH p AS (
      |  SELECT doc_id, substr(text, 1, 16) AS pfx FROM documents
      |  WHERE length(text) >= 16
      |), b1 AS (
      |  SELECT doc_id, pfx, substr(pfx, 1, 8) AS b FROM p
      |), b2 AS (
      |  SELECT doc_id, pfx, substr(pfx, 9, 8) AS b FROM p
      |), k1 AS (
      |  SELECT * FROM b1 WHERE b IN (
      |    SELECT b FROM b1 GROUP BY b HAVING count(*) <= 1000)
      |), k2 AS (
      |  SELECT * FROM b2 WHERE b IN (
      |    SELECT b FROM b2 GROUP BY b HAVING count(*) <= 1000)
      |), cand AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pfx AS pa, b.pfx AS pb
      |  FROM k1 a JOIN k1 b ON a.b = b.b AND a.doc_id < b.doc_id
      |  UNION
      |  SELECT a.doc_id, b.doc_id, a.pfx, b.pfx
      |  FROM k2 a JOIN k2 b ON a.b = b.b AND a.doc_id < b.doc_id
      |)
      |SELECT a_id, b_id, CAST(levenshtein(pa, pb) AS INT) AS lev
      |FROM cand WHERE levenshtein(pa, pb) <= 1""".stripMargin
}
