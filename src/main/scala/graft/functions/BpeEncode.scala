package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** BPE APPLICATION — tokenize the corpus with a learned merge table,
  * the encode step every real LLM data pipeline runs between tokenizer
  * induction and packing (the reference tokenizes before all stats and
  * packing: /root/reference/NLP/llama2/src/prepare_dataset.py's
  * tokenizer pass, /root/reference/MachineLearning/Ray/zephyr/
  * daily_eval.py:173-176's ctx_len truncation). [[BpeMerges]] LEARNS
  * the table; this applies it.
  *
  * Shape: the corpus collapses once to the (word, freq) vocab
  * ([[BpeMerges.wordFreq]]); the k greedy merge passes run per word
  * TYPE, never per occurrence — vocab-sized work, the standard BPE
  * trick. The word→token map then joins back onto the exploded corpus
  * (AQE broadcasts it when the vocab fits; at 100 TB it is a plain
  * shuffle join on the word key). The merge table itself is k rows
  * collected to the driver — bounded by construction.
  *
  * Determinism: each merge is ONE greedy leftmost non-overlapping pass
  * (exactly [[BpeMerges.topMerges]]'s application step, so
  * encode ∘ learn round-trips the training corpus's own merges —
  * spec-asserted), which is also exactly what SQL `replace` does over
  * a boundary-wrapped symbol string — the DuckDB oracle replays
  * learning AND application with k unrolled rounds of
  * pair-count → argmax → replace.
  *
  * Constraint: input tokens must not contain U+0001/U+0002 (the
  * oracle's symbol-boundary sentinels); whitespace-split natural text
  * never does.
  */
object BpeEncode {

  /** Apply `merges` (in rank order) to one word: one greedy leftmost
    * pass per merge over the codepoint symbol sequence. */
  def applyMerges(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = BpeMerges.codepoints(word)
    merges.foreach { case (l, r) =>
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  /** The word→tokens map: learn k merges, then tokenize each vocab
    * word — (w, freq, n_toks, toks) with `toks` the space-joined token
    * sequence (words are whitespace-split, so tokens contain none).
    *
    * Plan shape (r19 optimization round, guide §4/§2.4): ONE corpus
    * pass builds the boundary-encoded vocab pin; learning reads it per
    * round and the final tokenization is the same literal codegen
    * `replace` chain + one split — the old form paid a SECOND full
    * corpus collapse (topMerges and the map each ran wordFreq) and ran
    * the merge application as a per-row Scala closure through Dataset
    * encoders. Values bit-identical ([[applyMerges]] stays as the spec
    * reference; the replace-chain ≡ greedy-leftmost argument is the
    * oracle's own boundary-encoding argument). */
  def vocabTokens(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val vocab0 = BpeMerges.encodedVocab(docs, textCol).localCheckpoint()
    // ≤ k merges to the driver — the merge table, bounded by construction
    val merges = BpeMerges.learnMerges(vocab0.select("s", "freq"), k)
      .map(m => (m._2, m._3))
    vocab0
      .withColumn("s", BpeMerges.applyMergesCol(col("s"), merges))
      .withColumn("syms", split(expr("substring(s, 2, length(s) - 2)"),
        BpeMerges.B2 + BpeMerges.B1))
      .select(col("w"), col("freq"),
        size(col("syms")).cast("long").as("n_toks"),
        array_join(col("syms"), " ").as("toks"))
  }

  /** Per-document REAL token counts under the learned tokenizer:
    * (id, n_words, n_tokens). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             k: Int): DataFrame = {
    val vocab = vocabTokens(docs, textCol, k).select("w", "n_toks")
    docs
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .join(vocab, "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum("n_toks").as("n_tokens"))
  }

  // ---- query-map entries (hash-gated; learning + application both
  // ---- replayed by the unrolled DuckDB oracle) ----

  val GatedK = 6

  def bpeEncodeDocs(spark: SparkSession, dir: String): DataFrame =
    encode(Tables.documents(spark, dir), "doc_id", "text", GatedK)

  /** The tokenization itself, byte-exact per word type. */
  def bpeVocabDocs(spark: SparkSession, dir: String): DataFrame =
    vocabTokens(Tables.documents(spark, dir), "text", GatedK)

  /** [[graft.operators.TokenPack]] over REAL BPE token counts instead
    * of whitespace counts — prepare_dataset.py's tokenize-then-pack
    * order. */
  def tokenPackBpeDocs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TokenPack.pack(
        // pin the encode output: the pack's two-phase cumsum reads its
        // input from BOTH the slice pass and the offset rollup, and the
        // encode DAG (k learn rounds + the vocab join) must run once,
        // not once per reference (3x at the 100x replica)
        bpeEncodeDocs(spark, dir).select("doc_id", "n_tokens")
          .localCheckpoint(),
        "doc_id", "n_tokens", budget = 512L)
      .select("doc_id", "n_tokens", "pack_id", "pack_offset")

  /** Context-length truncation/padding audit at `ctxLen`, the
    * per-example accounting behind the reference's
    * `padding='max_length', truncation=True, max_length=ctx_len`
    * tokenizer call (/root/reference/MachineLearning/Ray/zephyr/
    * daily_eval.py:173-176): kept/dropped/pad token counts and the
    * window utilization in exact permille — the batch-shape / waste
    * report every fixed-window serving loop needs. Map-side arithmetic
    * over the encode output. */
  def ctxTruncation(encoded: DataFrame, ctxLen: Long): DataFrame =
    encoded.select(col("doc_id"), col("n_tokens"),
      least(col("n_tokens"), lit(ctxLen)).as("tokens_kept"),
      greatest(col("n_tokens") - ctxLen, lit(0L)).as("tokens_dropped"),
      greatest(lit(ctxLen) - col("n_tokens"), lit(0L)).as("pad_tokens"),
      (col("n_tokens") > ctxLen).as("truncated"),
      expr(s"(1000 * least(n_tokens, $ctxLen)) div $ctxLen")
        .as("utilization_permille"))

  val GatedCtxLen = 256L

  def ctxTruncationDocs(spark: SparkSession, dir: String): DataFrame =
    ctxTruncation(bpeEncodeDocs(spark, dir), GatedCtxLen)

  /** Sequence-length BUDGET selection + the truncation report AT that
    * budget — the reference's exact flow for choosing max_length
    * (/root/reference/MachineLearning/Ray/zephyr/template_dataset.py:
    * 163-183: tokenize, sort lengths, take the 99.9th-percentile index
    * `round(n·0.999) − 1`, print the length — 841 — and size the
    * window to it): the percentile is an EXACT order statistic over
    * the per-doc token counts (value-domain histogram + cumulative
    * rank — the [[graft.operators.GroupQuantiles]] discipline, never a
    * corpus-wide sort), and the pooled truncation accounting at that
    * data-derived budget is one aggregate over the encode output.
    * Index rounding is half-up, declared (Python's round is
    * banker's; at the gate sizes the two agree). One row:
    * (p_permille, budget_tokens, n_docs, n_truncated, tokens_kept,
    * tokens_dropped, pad_tokens, utilization_permille). */
  def ctxBudget(encoded: DataFrame, pPermille: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val enc = encoded.localCheckpoint() // histogram pass + accounting pass
    val hist = enc.groupBy(col("n_tokens").as("__len"))
      .agg(count(lit(1)).as("__c"))
    // value-domain window: one row per DISTINCT length, bounded by the
    // longest document, never corpus-sized
    val cum = hist.withColumn("__cum",
      sum("__c").over(Window.orderBy("__len")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val budget = cum
      .crossJoin(broadcast(enc.agg(count(lit(1)).as("__n"))))
      .withColumn("__idx", expr(s"($pPermille * __n + 500) div 1000"))
      .filter(col("__cum") >= col("__idx"))
      .agg(min("__len").as("budget_tokens"))
    enc.crossJoin(broadcast(budget))
      // grouped on the (constant) budget, not a global agg: an empty
      // corpus then yields ZERO rows on both engines instead of a
      // Spark-only all-null row (the EpochPlan empty-corpus lesson)
      .groupBy("budget_tokens")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_tokens") > col("budget_tokens"), 1L).otherwise(0L))
          .as("n_truncated"),
        sum(least(col("n_tokens"), col("budget_tokens"))).as("tokens_kept"),
        sum(greatest(col("n_tokens") - col("budget_tokens"), lit(0L)))
          .as("tokens_dropped"),
        sum(greatest(col("budget_tokens") - col("n_tokens"), lit(0L)))
          .as("pad_tokens"))
      .select(lit(pPermille).as("p_permille"), col("budget_tokens"),
        col("n_docs"), col("n_truncated"), col("tokens_kept"),
        col("tokens_dropped"), col("pad_tokens"),
        expr("(1000 * tokens_kept) div (n_docs * budget_tokens)")
          .as("utilization_permille"))
  }

  val GatedPctPermille = 999L

  def ctxBudgetDocs(spark: SparkSession, dir: String): DataFrame =
    ctxBudget(bpeEncodeDocs(spark, dir).select("doc_id", "n_tokens"),
      GatedPctPermille)

  /** Packed-sequence BOUNDARY manifest per pack — the attention-mask
    * sidecar every packed trainer needs (docs concatenated into fixed
    * windows must not attend across document boundaries; the packer
    * emits where each doc starts): per [[graft.operators.TokenPack]]
    * pack, the count of docs STARTING in it, their sorted start
    * offsets as the boundary list, the tokens they contribute, and
    * whether the pack opens mid-document (first boundary > 0 — the
    * spillover of a doc that started in an earlier pack).
    *
    * Packs in which NO doc starts (fully interior to a doc longer
    * than `budget`) are emitted too, as (0, 0, '', opens_mid_doc=1)
    * rows — without them the sidecar cannot distinguish an
    * all-one-doc pack from a nonexistent pack id. Interior packs come
    * from a per-doc bounded explode of the packs the doc spills into
    * (≤ n_tokens/budget + 1 rows per doc, the groupTexts envelope);
    * one groupBy over starts ∪ spill; boundary lists are pack-bounded
    * (≤ budget docs). */
  def packBoundaries(packed: DataFrame, budget: Long): DataFrame = {
    val starts =
      packed.select(col("pack_id"), col("n_tokens"), col("pack_offset"))
    val spill = packed
      .filter(col("pack_offset") + col("n_tokens") > budget)
      .select(
        explode(expr(s"sequence(pack_id + 1, " +
          s"(pack_id * $budget + pack_offset + n_tokens - 1) div $budget)"))
          .as("pack_id"),
        lit(null).cast("long").as("n_tokens"),
        lit(null).cast("long").as("pack_offset"))
    starts.unionByName(spill)
      .groupBy("pack_id")
      .agg(count(col("pack_offset")).as("n_docs_start"),
        coalesce(sum("n_tokens"), lit(0L)).as("tokens_started"),
        min("pack_offset").as("__first"),
        concat_ws(",",
          expr("transform(array_sort(collect_list(pack_offset))," +
            " x -> CAST(x AS STRING))")).as("boundaries"))
      .select(col("pack_id"), col("n_docs_start"), col("tokens_started"),
        col("boundaries"),
        coalesce(col("__first") > 0L, lit(true)).cast("int")
          .as("opens_mid_doc"))
  }

  def packBoundariesDocs(spark: SparkSession, dir: String): DataFrame =
    packBoundaries(tokenPackBpeDocs(spark, dir), budget = 512L)

  /** T5 `group_texts` — concatenate every document's token stream and
    * cut fixed-length training chunks, dropping the tail remainder
    * (/root/reference/NLP/accelerate_pretrain_t5_base_mlm.py:56-76:
    * `total_length = (total_length // expanded_inputs_length) *
    * expanded_inputs_length` then slices of exactly that length) —
    * unlike [[graft.operators.TokenPack]] (docs keep identity, packs
    * are where docs START), group_texts SPLITS documents across chunk
    * boundaries: a chunk owns token positions [c·L, (c+1)·L).
    *
    * Relational shape: the doc-order token cumsum assigns each doc its
    * global [st, st+n) interval; a doc touches chunks ⌊st/L⌋ ..
    * ⌊(st+n−1)/L⌋ — ONE bounded explode per doc (≤ n/L + 1 chunks),
    * then a per-chunk rollup of the overlap lengths. Output per FULL
    * chunk: (chunk_id, n_docs, first_doc_id, last_doc_id,
    * tokens_from_first, tokens_from_last) — boundary accounting the
    * collator's examples inherit. Linear in tokens/L; the cumsum is
    * [[graft.operators.SaltedCumSum]]'s two-phase shape. */
  def groupTexts(encoded: DataFrame, idCol: String, tokCol: String,
                 chunkLen: Long): DataFrame = {
    require(chunkLen >= 1)
    val cum = graft.operators.SaltedCumSum(
      encoded.select(col(idCol), col(tokCol)),
      partCols = Seq.empty, orderCols = Seq(col(idCol)),
      valueCol = tokCol,
      saltCol = expr(s"CAST($idCol AS BIGINT) DIV 1000"), out = "__cum")
      .withColumn("__st", col("__cum") - col(tokCol))
      .localCheckpoint() // consumed by the explode AND the total
    val total = cum.agg(sum(col(tokCol)).as("__tot"))
    cum.crossJoin(broadcast(total))
      .filter(col(tokCol) > 0)
      .withColumn("chunk_id", explode(expr(
        s"sequence(__st div $chunkLen, (__st + $tokCol - 1) div $chunkLen)")))
      // full chunks only: the remainder tail is DROPPED, per group_texts
      .filter(col("chunk_id") < expr(s"__tot div $chunkLen"))
      .withColumn("__ov",
        least(col("__st") + col(tokCol), (col("chunk_id") + 1) * chunkLen) -
          greatest(col("__st"), col("chunk_id") * chunkLen))
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        min(col(idCol)).as("first_doc_id"),
        max(col(idCol)).as("last_doc_id"),
        // doc ids are unique, so the struct extrema ARE argmin/argmax
        max(struct(col(idCol).as("__id"), col("__ov")))
          .getField("__ov").as("tokens_from_last"),
        min(struct(col(idCol).as("__id"), col("__ov")))
          .getField("__ov").as("tokens_from_first"))
      .select(col("chunk_id"), col("n_docs"), col("first_doc_id"),
        col("last_doc_id"), col("tokens_from_first"),
        col("tokens_from_last"))
  }

  val GatedChunkLen = 568L // the reference's expanded_inputs_length

  def groupTextsDocs(spark: SparkSession, dir: String): DataFrame =
    groupTexts(bpeEncodeDocs(spark, dir).select("doc_id", "n_tokens")
        .localCheckpoint(), // pin the encode DAG (token_pack_bpe lesson)
      "doc_id", "n_tokens", GatedChunkLen)

  /** Tokenizer FERTILITY per corpus slice — the tokens-per-word
    * quality readout a tokenizer owner tracks per language/domain
    * (high fertility on a slice means the vocab underserves it; the
    * reference's tokenize-before-stats pass in prepare_dataset.py is
    * where this is measured): per source, pooled words/tokens and
    * fertility = tokens/word in exact permille, plus mean tokens per
    * doc. One narrow join of the encode output to the doc dimension +
    * one aggregate. */
  def bpeFertility(encoded: DataFrame, dims: DataFrame, idCol: String,
                   sliceCol: String): DataFrame =
    encoded.join(dims.select(col(idCol), col(sliceCol)), idCol)
      .groupBy(col(sliceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_tokens").as("n_tokens"))
      .withColumn("fertility_permille",
        expr("(1000 * n_tokens) div n_words"))
      .withColumn("tokens_per_doc_permille",
        expr("(1000 * n_tokens) div n_docs"))

  def bpeFertilityDocs(spark: SparkSession, dir: String): DataFrame =
    bpeFertility(bpeEncodeDocs(spark, dir),
      Tables.documents(spark, dir), "doc_id", "source")

  // ---- oracle: k unrolled learn+apply rounds over the wrapped vocab ----

  /** Each vocab word rides as chr(1)‖sym‖chr(2) boundary-wrapped
    * symbols, so `replace(s, ⟨l⟩⟨r⟩, ⟨lr⟩)` is exactly one greedy
    * leftmost non-overlapping merge pass: the consumed boundary chars
    * make overlapping matches impossible and symbol-prefix/suffix
    * false matches unrepresentable. */
  def oracleEncChain(k: Int): String = {
    val sb = new StringBuilder
    sb.append(
      """vocab_0 AS MATERIALIZED (
        |  SELECT w, CAST(count(*) AS BIGINT) AS freq,
        |    array_to_string(list_transform(generate_series(1, len(w)),
        |      i -> chr(1) || substr(w, CAST(i AS INT), 1) || chr(2)), '') AS s
        |  FROM (SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
        |        FROM documents)
        |  WHERE len(w) > 0 GROUP BY w)""".stripMargin)
    for (r <- 1 to k) {
      val p = r - 1
      sb.append(s""",
        |pairs_$r AS MATERIALIZED (
        |  SELECT l, r2, CAST(sum(freq) AS BIGINT) AS c FROM (
        |    SELECT syms[CAST(i AS INT)] AS l, syms[CAST(i AS INT) + 1] AS r2, freq FROM (
        |      SELECT string_split(substr(s, 2, len(s) - 2), chr(2) || chr(1)) AS syms,
        |        freq
        |      FROM vocab_$p) v,
        |      unnest(generate_series(1, len(syms) - 1)) AS t(i))
        |  GROUP BY l, r2),
        |best_$r AS MATERIALIZED (
        |  SELECT l, r2 FROM pairs_$r WHERE c >= 2 ORDER BY c DESC, l, r2 LIMIT 1),
        |vocab_$r AS MATERIALIZED (
        |  SELECT w, freq,
        |    CASE WHEN (SELECT count(*) FROM best_$r) = 1
        |      THEN replace(s,
        |        chr(1) || (SELECT l FROM best_$r) || chr(2)
        |          || chr(1) || (SELECT r2 FROM best_$r) || chr(2),
        |        chr(1) || (SELECT l FROM best_$r) || (SELECT r2 FROM best_$r) || chr(2))
        |      ELSE s END AS s
        |  FROM vocab_$p)""".stripMargin)
    }
    sb.append(s""",
      |enc AS MATERIALIZED (
      |  SELECT w, freq,
      |    CAST(len(string_split(substr(s, 2, len(s) - 2), chr(2) || chr(1)))
      |      AS BIGINT) AS n_toks,
      |    array_to_string(string_split(substr(s, 2, len(s) - 2),
      |      chr(2) || chr(1)), ' ') AS toks
      |  FROM vocab_$k)""".stripMargin)
    sb.toString
  }

  private def docJoinSql: String =
    """docw AS MATERIALIZED (
      |  SELECT doc_id, x AS w
      |  FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS x
      |        FROM documents)
      |  WHERE len(x) > 0),
      |perdoc AS MATERIALIZED (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
      |    CAST(sum(n_toks) AS BIGINT) AS n_tokens
      |  FROM docw JOIN enc USING (w) GROUP BY doc_id)""".stripMargin

  // NOTE: the chain is CONCATENATED, never re-interpolated into another
  // stripMargin string — its `||` continuation lines would lose a pipe
  // to a second margin strip (the SftPrep.preparedSql discipline).
  def encodeOracleSql: String =
    "WITH " + oracleEncChain(GatedK) + ",\n" + docJoinSql +
      "\nSELECT doc_id, n_words, n_tokens FROM perdoc"

  def vocabOracleSql: String =
    "WITH " + oracleEncChain(GatedK) +
      "\nSELECT w, freq, n_toks, toks FROM enc"

  def fertilityOracleSql: String =
    "WITH " + oracleEncChain(GatedK) + ",\n" + docJoinSql + "\n" +
      """SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(p.n_words) AS BIGINT) AS n_words,
        |  CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
        |  CAST((1000 * sum(p.n_tokens)) // sum(p.n_words) AS BIGINT)
        |    AS fertility_permille,
        |  CAST((1000 * sum(p.n_tokens)) // count(*) AS BIGINT)
        |    AS tokens_per_doc_permille
        |FROM perdoc p JOIN documents d USING (doc_id)
        |GROUP BY d.source""".stripMargin

  def ctxTruncationOracleSql: String =
    "WITH " + oracleEncChain(GatedK) + ",\n" + docJoinSql + "\n" +
      s"""SELECT doc_id, n_tokens,
         |  least(n_tokens, $GatedCtxLen) AS tokens_kept,
         |  greatest(n_tokens - $GatedCtxLen, 0) AS tokens_dropped,
         |  greatest($GatedCtxLen - n_tokens, 0) AS pad_tokens,
         |  n_tokens > $GatedCtxLen AS truncated,
         |  (1000 * least(n_tokens, $GatedCtxLen)) // $GatedCtxLen
         |    AS utilization_permille
         |FROM perdoc""".stripMargin

  def tokenPackOracleSql: String =
    "WITH " + oracleEncChain(GatedK) + ",\n" + docJoinSql + ",\n" +
      """cum AS (
        |  SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      - n_tokens AS st
        |  FROM perdoc)
        |SELECT doc_id, n_tokens,
        |  CAST(st // 512 AS BIGINT) AS pack_id,
        |  CAST(st % 512 AS BIGINT) AS pack_offset
        |FROM cum""".stripMargin

  def ctxBudgetOracleSql: String =
    "WITH " + oracleEncChain(GatedK) + ",\n" + docJoinSql + ",\n" +
      s"""hist AS (
        |  SELECT n_tokens AS len, CAST(count(*) AS BIGINT) AS c
        |  FROM perdoc GROUP BY 1
        |), cum AS (
        |  SELECT len, CAST(sum(c) OVER (ORDER BY len
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cm
        |  FROM hist
        |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM perdoc),
        |bud AS (
        |  SELECT CAST(min(len) AS BIGINT) AS budget_tokens
        |  FROM cum CROSS JOIN nn
        |  WHERE cm >= ($GatedPctPermille * n + 500) // 1000
        |)
        |SELECT CAST($GatedPctPermille AS BIGINT) AS p_permille,
        |  b.budget_tokens,
        |  (SELECT n FROM nn) AS n_docs,
        |  CAST(sum(CASE WHEN p.n_tokens > b.budget_tokens THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_truncated,
        |  CAST(sum(least(p.n_tokens, b.budget_tokens)) AS BIGINT)
        |    AS tokens_kept,
        |  CAST(sum(greatest(p.n_tokens - b.budget_tokens, 0)) AS BIGINT)
        |    AS tokens_dropped,
        |  CAST(sum(greatest(b.budget_tokens - p.n_tokens, 0)) AS BIGINT)
        |    AS pad_tokens,
        |  CAST((1000 * sum(least(p.n_tokens, b.budget_tokens)))
        |    // ((SELECT n FROM nn) * b.budget_tokens) AS BIGINT)
        |    AS utilization_permille
        |FROM perdoc p CROSS JOIN bud b
        |GROUP BY b.budget_tokens""".stripMargin

  def groupTextsOracleSql: String =
    "WITH " + oracleEncChain(GatedK) + ",\n" + docJoinSql + ",\n" +
      s"""cum AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      - n_tokens AS BIGINT) AS st
        |  FROM perdoc),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM perdoc),
        |touch AS (
        |  SELECT c.doc_id, c.n_tokens, c.st, CAST(i AS BIGINT) AS chunk_id
        |  FROM cum c CROSS JOIN tot,
        |    unnest(generate_series(c.st // $GatedChunkLen,
        |      (c.st + c.n_tokens - 1) // $GatedChunkLen)) AS u(i)
        |  WHERE c.n_tokens > 0 AND i < tot.t // $GatedChunkLen),
        |ov AS (
        |  SELECT chunk_id, doc_id,
        |    least(st + n_tokens, (chunk_id + 1) * $GatedChunkLen)
        |      - greatest(st, chunk_id * $GatedChunkLen) AS o
        |  FROM touch)
        |SELECT chunk_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS first_doc_id,
        |  CAST(max(doc_id) AS BIGINT) AS last_doc_id,
        |  CAST(min_by(o, doc_id) AS BIGINT) AS tokens_from_first,
        |  CAST(max_by(o, doc_id) AS BIGINT) AS tokens_from_last
        |FROM ov GROUP BY chunk_id""".stripMargin

  def packBoundariesOracleSql: String =
    "WITH " + oracleEncChain(GatedK) + ",\n" + docJoinSql + ",\n" +
      """cum AS (
        |  SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |      - n_tokens AS st
        |  FROM perdoc),
        |packed AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(st // 512 AS BIGINT) AS pack_id,
        |    CAST(st % 512 AS BIGINT) AS pack_offset
        |  FROM cum),
        |spill AS (
        |  SELECT unnest(generate_series(pack_id + 1,
        |      (pack_id * 512 + pack_offset + n_tokens - 1) // 512))
        |    AS pack_id
        |  FROM packed WHERE pack_offset + n_tokens > 512),
        |allrows AS (
        |  SELECT pack_id, n_tokens, pack_offset FROM packed
        |  UNION ALL
        |  SELECT pack_id, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM spill)
        |SELECT pack_id, CAST(count(pack_offset) AS BIGINT) AS n_docs_start,
        |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS tokens_started,
        |  coalesce(string_agg(CAST(pack_offset AS VARCHAR), ','
        |      ORDER BY pack_offset), '') AS boundaries,
        |  CAST(coalesce(min(pack_offset) > 0, TRUE) AS INT)
        |    AS opens_mid_doc
        |FROM allrows GROUP BY pack_id""".stripMargin
}
