package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  // Boundary sentinels for the encoded symbol string (the same trick the
  // DuckDB oracle uses with chr(1)/chr(2)): each symbol rides as ␁sym␂,
  // so a literal `replace(s, ␁l␂␁r␂, ␁lr␂)` is exactly one greedy
  // leftmost non-overlapping merge pass — StringReplace scans the input
  // left-to-right and never rescans its own output, and the consumed
  // boundary chars make overlapping matches impossible and
  // symbol-prefix/suffix false matches unrepresentable. Input words
  // must not contain U+0001/U+0002 (declared on [[BpeEncode]]).
  private[functions] val B1 = ""
  private[functions] val B2 = ""

  /** (w, freq, s) with `s` the boundary-encoded PER-CODEPOINT symbol
    * string (Java regex `.` matches one code point, so astral chars
    * stay whole symbols — the [[codepoints]] contract in expression
    * space). One corpus pass; callers pin it. */
  private[functions] def encodedVocab(docs: DataFrame, textCol: String): DataFrame =
    wordFreq(docs, textCol)
      .select(col("w"), col("freq"),
        regexp_replace(col("w"), "(.)", B1 + "$1" + B2).as("s"))

  /** The literal merge chain over an encoded symbol-string column: a
    * left fold of `replace` passes over ONE array literal, in rank
    * order — replaces the old per-row Scala closure
    * ([[BpeEncode.applyMerges]] stays as the spec reference). The fold
    * is deliberately `aggregate` over a `typedlit` rather than a chain
    * of r `replace` calls: the chain's generated source CHANGES LENGTH
    * every round, so each of the k learning rounds paid a fresh janino
    * compile (measured ~0.6 s of the old bpe_merges key); the fold's
    * plan shape is constant — the merge table lives in the literal
    * references, one codegen unit for all rounds. Per-row cost is ≤ k
    * interpreted UTF8String.replace calls on short strings. */
  private[functions] def applyMergesCol(s: Column,
      merges: Seq[(String, String)]): Column =
    if (merges.isEmpty) s
    else {
      val pats = merges.map { case (l, r) =>
        (B1 + l + B2 + B1 + r + B2, B1 + l + r + B2)
      }
      aggregate(typedlit(pats), s,
        (acc, m) => replace(acc, m.getField("_1"), m.getField("_2")))
    }

  /** The adjacent-pair count table of an encoded vocab: (l, r, c).
    * Explode + element_at at the top level (codegen), never a lambda —
    * HOF lambdas run interpreted (the LongArrayDot lesson). */
  private[functions] def pairCounts(encVocab: DataFrame): DataFrame =
    encVocab
      .select(col("freq"),
        split(expr("substring(s, 2, length(s) - 2)"), B2 + B1).as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), col("syms"),
        explode(expr("sequence(1, size(syms) - 1)")).as("i"))
      .select(expr("element_at(syms, i)").as("l"),
        expr("element_at(syms, i + 1)").as("r"), col("freq"))
      .groupBy("l", "r").agg(sum("freq").as("c"))

  /** Greedy merge learning over a pinned encoded vocab (s, freq):
    * each round one pair-count aggregate + `limit(1)` argmax (a single
    * row to the driver), the working vocab re-derived from the pin by
    * the literal replace chain — map-side codegen replays instead of a
    * per-round checkpoint job (k is small and bounded; Σr replays of a
    * one-`replace` pass cost less than k materializations). */
  private[functions] def learnMerges(vocab0: DataFrame,
      k: Int): Seq[(Int, String, String, Long)] = {
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var applied = Vector.empty[(String, String)]
    var round = 1
    var done = false
    while (round <= k && !done) {
      val cur = vocab0.select(applyMergesCol(col("s"), applied).as("s"),
        col("freq"))
      val best = pairCounts(cur)
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      best.headOption match {
        case Some(row) if row.getLong(2) >= 2 =>
          val (l, r) = (row.getString(0), row.getString(1))
          merges += ((round, l, r, row.getLong(2)))
          applied :+= ((l, r))
          round += 1
        case _ => done = true // no pair repeats: a further merge is noise
      }
    }
    merges.result()
  }

  /** Top `k` BPE merges over whitespace-lowercase words of `textCol`:
    * (merge_rank, left, right, pair_count). Stops early if no pair
    * repeats. */
  def topMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, "need at least one merge")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab0 = encodedVocab(docs, textCol).select("s", "freq")
      .localCheckpoint()
    learnMerges(vocab0, k).toDF("merge_rank", "left", "right", "pair_count")
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
