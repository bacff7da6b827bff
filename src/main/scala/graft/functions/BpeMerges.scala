package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Byte-pair-encoding merge mining — the tokenizer-induction step of an
  * LLM data pipeline (the reference consumes pretrained tokenizers,
  * /root/reference/MachineLearning/Data/flan2022_submix/prepare_dataset.py;
  * this is how one is LEARNED from the corpus, Sennrich et al.'s BPE).
  *
  * Shape: the corpus collapses ONCE to the (word, freq) vocabulary —
  * everything after runs at VOCAB cardinality, the standard trick that
  * makes BPE tractable (merges act on word types, weighted by
  * frequency, never on the token stream). Each round is one pair-count
  * aggregate over the vocab, one `limit(1)` argmax (a single row to the
  * driver — bounded by construction), and one map applying the merge
  * greedily left-to-right. Rounds are lineage-capped by checkpoint.
  *
  * Determinism: the argmax total-orders by (count DESC, left, right),
  * and the merge application is the standard leftmost-first single
  * pass — same corpus, same merges, any partitioning.
  */
object BpeMerges {

  case class Vw(syms: Seq[String], freq: Long)

  /** Initial symbols = CODEPOINTS, not UTF-16 code units (`split("")`
    * halves astral characters into surrogate pairs, which both breaks
    * BPE's symbol model and diverges from the DuckDB oracle's
    * codepoint-wise `substr` on the k=1 gate). */
  private[functions] def codepoints(w: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** The collapsed (word, freq) vocabulary of `textCol` — the ONE
    * corpus-sized pass; everything BPE does afterwards (learning in
    * [[topMerges]], application in [[BpeEncode]]) runs at vocab
    * cardinality. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Top `k` BPE merges over whitespace-lowercase words of `textCol`:
    * (merge_rank, left, right, pair_count). Stops early if no pair
    * repeats. */
  def topMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "need at least one merge")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: Dataset[Vw] = wordFreq(docs, textCol)
      .as[(String, Long)]
      .map { case (w, f) => Vw(codepoints(w), f) }
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var round = 1
    var done = false
    while (round <= k && !done) {
      val best = vocab.flatMap { v =>
          if (v.syms.length < 2) Iterator.empty
          else v.syms.sliding(2).map(p => ((p(0), p(1)), v.freq))
        }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((l, r), c) => (l, r, c) }
        .toDF("l", "r", "c")
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).as[(String, String, Long)]
        .collect()
      best.headOption match {
        case Some((l, r, c)) if c >= 2 =>
          merges += ((round, l, r, c))
          vocab = vocab.map { v =>
            val out = Seq.newBuilder[String]
            var i = 0
            while (i < v.syms.length) {
              if (i + 1 < v.syms.length && v.syms(i) == l && v.syms(i + 1) == r) {
                out += (l + r); i += 2
              } else { out += v.syms(i); i += 1 }
            }
            Vw(out.result(), v.freq)
          }.localCheckpoint()
          round += 1
        case _ => done = true // no pair repeats: a further merge is noise
      }
    }
    merges.result().toDF("merge_rank", "left", "right", "pair_count")
  }

  // ---- query-map entry (hash-gated; r19 closed the recursion gate) ----

  /** Gated instance: top-8 merges over the documents corpus. HASH-gated
    * since round 19: the greedy argmax recursion IS expressible as a
    * recursive DuckDB CTE (see [[mergesOracleSql]]) — each iteration
    * re-derives the working vocabulary's best pair in a subquery over
    * the recursive reference and applies it with a boundary-encoded
    * `replace` — so the whole k=8 loop (vocab collapse, pair counting,
    * argmax total order, leftmost-first merge application, early stop)
    * sits inside the gate. The exact merge sequence on a planted corpus
    * is additionally hand-verified in Round10OpsSpec. */
  def bpeMergesDocs(spark: SparkSession, dir: String): DataFrame =
    topMerges(Tables.documents(spark, dir), "text", k = 8)

  /** The k=8 greedy recursion as one recursive CTE. State = the vocab
    * with each word's symbol sequence BOUNDARY-ENCODED as
    * ␞sym₁␟␞sym₂␟… (chr 30/31, absent from any whitespace-split word):
    * applying merge (l,r) leftmost-first non-overlapping — the exact
    * [[topMerges]] semantics, including the "aaa"→["aa","a"] skip — is
    * then a single `replace(enc, ␞l␟␞r␟, ␞lr␟)`, since SQL replace
    * scans left-to-right without rescanning its own output and the
    * ␞…␟ framing makes matches align on symbol boundaries. Each
    * iteration picks the (count DESC, l, r) argmax of the CURRENT
    * working table in a derived subquery (DuckDB allows the second
    * recursive reference) and stops when no pair repeats. The final
    * merge table re-derives each round's argmax post-hoc with the
    * identical total order — bit-equal to what the recursion applied. */
  def mergesOracleSql: String =
    """WITH RECURSIVE wd AS (
      |  SELECT x AS w, CAST(count(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS x
      |        FROM documents)
      |  WHERE len(x) > 0 GROUP BY 1
      |), init AS (
      |  SELECT list_aggregate(list_transform(generate_series(1, length(w)),
      |           i -> chr(30) || substr(w, i, 1) || chr(31)),
      |           'string_agg', '') AS enc,
      |         freq
      |  FROM wd
      |), rec AS (
      |  SELECT 1 AS rnd, enc, freq FROM init
      |  UNION ALL
      |  SELECT rnd + 1,
      |    replace(enc, chr(30) || b.l || chr(31) || chr(30) || b.r || chr(31),
      |                 chr(30) || b.l || b.r || chr(31)),
      |    freq
      |  FROM rec, (
      |    SELECT l, r FROM (
      |      SELECT syms[i] AS l, syms[i + 1] AS r, sum(freq) AS c,
      |        row_number() OVER (ORDER BY sum(freq) DESC, syms[i], syms[i + 1]) AS rn
      |      FROM (SELECT string_split(substr(enc, 2, length(enc) - 2),
      |              chr(31) || chr(30)) AS syms, freq FROM rec) t,
      |        unnest(generate_series(1, len(syms) - 1)) AS u(i)
      |      GROUP BY 1, 2 HAVING sum(freq) >= 2
      |    ) WHERE rn = 1) b
      |  WHERE rnd <= 8
      |), pr AS (
      |  SELECT rnd, syms[i] AS l, syms[i + 1] AS r,
      |    CAST(sum(freq) AS BIGINT) AS c,
      |    row_number() OVER (PARTITION BY rnd
      |      ORDER BY sum(freq) DESC, syms[i], syms[i + 1]) AS rn
      |  FROM (SELECT rnd, string_split(substr(enc, 2, length(enc) - 2),
      |          chr(31) || chr(30)) AS syms, freq FROM rec) t,
      |    unnest(generate_series(1, len(syms) - 1)) AS u(i)
      |  GROUP BY 1, 2, 3
      |)
      |SELECT CAST(rnd AS INT) AS merge_rank, l AS "left", r AS "right",
      |  c AS pair_count
      |FROM pr WHERE rn = 1 AND c >= 2 AND rnd <= 8""".stripMargin

  // ---- degeneracy-gated sibling (hash-gated) ----

  /** k=1 degeneracy: the first BPE merge is simply the most frequent
    * adjacent character pair over the (word, freq) vocab with the
    * (count DESC, left, right) total order — SQL-expressible, so the
    * vocab collapse, pair counting, weighting, and argmax ordering all
    * sit inside a DuckDB hash gate (the greedy RECURSION stays
    * rows+spec-gated on the k=8 key). */
  def bpeFirstMerge(spark: SparkSession, dir: String): DataFrame =
    topMerges(Tables.documents(spark, dir), "text", k = 1)

  def firstMergeOracleSql: String =
    """WITH wd AS (
      |  SELECT x AS w, count(*) AS freq
      |  FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS x
      |        FROM documents)
      |  WHERE len(x) > 0 GROUP BY 1
      |), pairs AS (
      |  SELECT substr(w, i, 1) AS l, substr(w, i + 1, 1) AS r, freq
      |  FROM wd, unnest(generate_series(1, len(w) - 1)) AS t(i)
      |  WHERE len(w) >= 2
      |), agg AS (
      |  SELECT l, r, CAST(sum(freq) AS BIGINT) AS c FROM pairs GROUP BY l, r
      |)
      |SELECT CAST(1 AS INT) AS merge_rank, l AS "left", r AS "right",
      |  c AS pair_count
      |FROM agg WHERE c >= 2 ORDER BY c DESC, l, r LIMIT 1""".stripMargin
}
