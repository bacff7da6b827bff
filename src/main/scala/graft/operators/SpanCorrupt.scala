package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{BpeEncode, MixMod61, Native}

/** T5 MLM span-corruption data prep — the collator step of the
  * reference's T5 pretrain pipeline
  * (/root/reference/NLP/accelerate_pretrain_t5_base_mlm.py:33-40,95-98:
  * DataCollatorForT5MLM with noise_density 0.15, mean_noise_span_length
  * 3.0 over the tokenized C4 stream), re-expressed as a deterministic
  * distributed operator over [[BpeEncode]]'s per-document token
  * sequences: each document's tokens split into k alternating
  * (nonnoise, noise) spans, the noise spans replaced by strictly
  * increasing `<extra_id_j>` sentinels in the input and emitted after
  * their sentinels in the target (final `<extra_id_k>` terminator) —
  * exactly the seq2seq example shape the collator feeds the trainer.
  *
  * Span choice follows the T5 recipe with the RNG replaced by the
  * [[MixMod61]] hash keyed on (doc_id, which-side, position), so both
  * engines pick IDENTICAL spans from exact integer thresholds:
  *   - noise tokens  m = clamp(round(0.15·n), 1, n−1)   (round half-up)
  *   - noise spans   k = clamp(round(m/3), 1, min(m, n−m))
  *   - m partitions into k span lengths by the k−1 smallest-hash cut
  *     positions among 1..m−1 (T5's random_segmentation with hash rank
  *     replacing the random permutation); the n−m nonnoise tokens
  *     partition into k segments the same way with an independent key.
  * Every segment is ≥ 1 token by construction and the interleave is
  * [nonnoise₁, noise₁, …, nonnoise_k, noise_k] — the collator's layout.
  * Deviation from the reference, declared: round is half-up (numpy's
  * is banker's) and the draw is a hash, not an RNG stream.
  *
  * Shape at scale: the BPE encode chain collapses the corpus to the
  * word vocab once ([[BpeEncode.vocabTokens]]); token sequences
  * reassemble with one per-doc sort (bounded by document length), the
  * cut draw is one explode of ~0.15·tokens rows ranked by a window
  * PARTITIONED BY (doc, side) — never an unpartitioned window — and
  * the final string assembly is per-row array math over doc-bounded
  * arrays. Everything is corpus-linear; nothing driver-side.
  */
object SpanCorrupt {

  /** Per-document ordered token arrays under the learned BPE
    * tokenizer: (doc_id, toks array<string>). One vocab join + one
    * per-doc reassembly sort. */
  def docTokens(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    val vocab = BpeEncode.vocabTokens(docs, textCol, k)
      .select(col("w"), split(col("toks"), " ").as("__ta"))
    docs
      .select(col(idCol),
        posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("__widx", "w")))
      .filter(length(col("w")) > 0)
      .join(vocab, "w")
      .groupBy(col(idCol))
      .agg(expr(
        "flatten(transform(array_sort(collect_list(struct(__widx, __ta)))," +
          " x -> x.__ta))").as("toks"))
  }

  private def mix(c: Column): Column =
    Native.call("graft_mix_mod61", exprs => MixMod61(exprs.head), c)

  /** Corrupt each document: (doc_id, n_tokens, n_noise, n_spans,
    * input_text, target_text). `docToks` must carry (doc_id,
    * toks array<string>); docs with fewer than 2 tokens pass through
    * uncorrupted (0 spans, empty target) — a 1-token doc cannot hold
    * both a noise and a nonnoise segment. */
  def corrupt(docToks: DataFrame): DataFrame = {
    val perdoc = docToks
      .withColumn("n", size(col("toks")))
      .withColumn("m", expr("greatest(1, least(n - 1, (3 * n + 10) div 20))"))
      .withColumn("k", expr(
        "greatest(1, least((2 * m + 3) div 6, least(m, n - m)))"))
      // pinned: read by the 2 cut draws AND the assembly — an unpinned
      // upstream DAG would re-derive 3× (the token_pack_bpe lesson)
      .localCheckpoint()
    corruptFrom(perdoc)
  }

  /** The assembly over a pinned (doc_id, toks, n, m, k) frame. */
  private def corruptFrom(perdoc: DataFrame): DataFrame = {
    val long2 = perdoc.filter(col("n") >= 2)

    // cut draw: position i on side `which` scores
    // mix(mix(2·doc_id + which − 1) + i); the k−1 smallest (h, i) win.
    def cuts(which: Int, domain: String, out: String): DataFrame =
      long2
        .filter(expr(s"$domain >= 2")) // ≥ 1 candidate position
        .select(col("doc_id"), col("k"),
          explode(expr(s"sequence(1, $domain - 1)")).as("i"))
        .withColumn("h",
          mix(mix(lit(2L) * col("doc_id") + lit(which - 1L)) +
            col("i").cast("long")))
        .withColumn("__r", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("h"), col("i"))))
        .filter(col("__r") <= col("k") - 1)
        .groupBy("doc_id")
        .agg(sort_array(collect_list(col("i"))).as(out))

    val withCuts = long2
      .join(cuts(1, "m", "__c1"), Seq("doc_id"), "left")
      .join(cuts(2, "n - m", "__c2"), Seq("doc_id"), "left")
      .withColumn("nb", expr(
        "concat(array(0), coalesce(__c1, array()), array(m))"))
      .withColumn("mb", expr(
        "concat(array(0), coalesce(__c2, array()), array(n - m))"))

    // nonnoise_j spans toks[mb[j]+nb[j]+1 .. mb[j+1]+nb[j]] (1-based,
    // 0-based bounds arrays); noise_j follows it
    val corrupted = withCuts.select(
      col("doc_id"), col("n").cast("long").as("n_tokens"),
      col("m").cast("long").as("n_noise"),
      col("k").cast("long").as("n_spans"),
      expr(
        """array_join(transform(sequence(0, k - 1), j -> concat(
          |  array_join(slice(toks,
          |    CAST(element_at(mb, CAST(j + 1 AS INT))
          |      + element_at(nb, CAST(j + 1 AS INT)) + 1 AS INT),
          |    CAST(element_at(mb, CAST(j + 2 AS INT))
          |      - element_at(mb, CAST(j + 1 AS INT)) AS INT)), ' '),
          |  ' <extra_id_', CAST(j AS STRING), '>')), ' ')""".stripMargin)
        .as("input_text"),
      expr(
        """concat(array_join(transform(sequence(0, k - 1), j -> concat(
          |  '<extra_id_', CAST(j AS STRING), '> ',
          |  array_join(slice(toks,
          |    CAST(element_at(mb, CAST(j + 2 AS INT))
          |      + element_at(nb, CAST(j + 1 AS INT)) + 1 AS INT),
          |    CAST(element_at(nb, CAST(j + 2 AS INT))
          |      - element_at(nb, CAST(j + 1 AS INT)) AS INT)), ' '))), ' '),
          |  ' <extra_id_', CAST(k AS STRING), '>')""".stripMargin)
        .as("target_text"))

    val short = perdoc.filter(col("n") < 2).select(
      col("doc_id"), col("n").cast("long").as("n_tokens"),
      lit(0L).as("n_noise"), lit(0L).as("n_spans"),
      expr("array_join(toks, ' ')").as("input_text"),
      lit("").as("target_text"))

    corrupted.unionByName(short)
  }

  // ---- query-map entry (hash-gated) ----

  def spanCorruptDocs(spark: SparkSession, dir: String): DataFrame =
    corrupt(docTokens(Tables.documents(spark, dir), "doc_id", "text",
      BpeEncode.GatedK))

  /** The reference's ACTUAL composition — tokenize → group_texts →
    * collator: [[BpeEncode.groupTexts]]' fixed-length chunks
    * reassembled as token sequences (doc-order cumsum → global
    * positions → per-chunk sort, each chunk exactly L tokens, the
    * remainder dropped) and corrupted with the identical
    * hash-deterministic span draw keyed on chunk_id. */
  def spanCorruptChunks(spark: SparkSession, dir: String): DataFrame = {
    val L = BpeEncode.GatedChunkLen
    val dt = docTokens(Tables.documents(spark, dir), "doc_id", "text",
        BpeEncode.GatedK)
      .withColumn("n", size(col("toks")).cast("long"))
      .localCheckpoint() // feeds the cumsum, the total AND the explode
    val cum = graft.operators.SaltedCumSum(dt, partCols = Seq.empty,
        orderCols = Seq(col("doc_id")), valueCol = "n",
        saltCol = expr("CAST(doc_id AS BIGINT) DIV 1000"), out = "__cum")
      .withColumn("__st", col("__cum") - col("n"))
    val tot = dt.agg(sum("n").as("__tot"))
    val chunks = cum.crossJoin(broadcast(tot))
      .select(col("__st"), col("__tot"),
        posexplode(col("toks")).as(Seq("__i", "tok")))
      .withColumn("gpos", col("__st") + col("__i"))
      .withColumn("doc_id", expr(s"gpos div $L"))
      .filter(col("doc_id") < expr(s"__tot div $L"))
      .groupBy("doc_id")
      .agg(expr(
        "transform(array_sort(collect_list(struct(gpos, tok)))," +
          " x -> x.tok)").as("toks"))
    corrupt(chunks).withColumnRenamed("doc_id", "chunk_id")
  }

  /** The doc-token CTE prefix shared with [[chunksOracleSql]]. */
  private def docToksCtes: String =
    "WITH " + BpeEncode.oracleEncChain(BpeEncode.GatedK) + ",\n" +
      """wordpos AS MATERIALIZED (
         |  SELECT doc_id, i AS widx, ws[CAST(i AS INT)] AS w
         |  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS ws
         |        FROM documents) d,
         |    unnest(generate_series(1, len(ws))) AS t(i)
         |  WHERE len(ws[CAST(i AS INT)]) > 0),
         |doctoks AS MATERIALIZED (
         |  SELECT wp.doc_id,
         |    flatten(list(string_split(e.toks, ' ') ORDER BY wp.widx)) AS toks
         |  FROM wordpos wp JOIN enc e USING (w) GROUP BY wp.doc_id)""".stripMargin

  /** The corruption chain over ANY (doc_id, toks) CTE named `src`;
    * `idOut` aliases the id column of the final select. */
  private def corruptionSql(src: String, idOut: String): String = {
    import graft.functions.Hll.{A, A2, B, P}
    s"""perdoc AS MATERIALIZED (
         |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n,
         |    greatest(1, least(CAST(len(toks) AS BIGINT) - 1,
         |      (3 * CAST(len(toks) AS BIGINT) + 10) // 20)) AS m
         |  FROM $src),
         |pk AS MATERIALIZED (
         |  SELECT doc_id, toks, n, m,
         |    greatest(1, least((2 * m + 3) // 6, least(m, n - m))) AS k
         |  FROM perdoc),
         |bk1 AS (
         |  SELECT doc_id, which,
         |    CAST((CAST($A AS HUGEINT) * (2 * doc_id + which - 1) + $B) % $P
         |      AS BIGINT) AS h1
         |  FROM pk, (SELECT unnest([1, 2]) AS which) w
         |  WHERE n >= 2),
         |bk2 AS (
         |  SELECT doc_id, which,
         |    CAST((CAST($A2 AS HUGEINT) * xor(h1, h1 >> 30)) % $P
         |      AS BIGINT) AS h2
         |  FROM bk1),
         |bk AS MATERIALIZED (
         |  SELECT doc_id, which, xor(h2, h2 >> 27) AS bh FROM bk2),
         |pos0 AS (
         |  SELECT doc_id, k, 1 AS which, i
         |  FROM pk, unnest(generate_series(1, m - 1)) AS t(i)
         |  WHERE n >= 2
         |  UNION ALL
         |  SELECT doc_id, k, 2 AS which, i
         |  FROM pk, unnest(generate_series(1, n - m - 1)) AS t(i)
         |  WHERE n >= 2),
         |pos1 AS (
         |  SELECT p.doc_id, p.k, p.which, p.i,
         |    CAST((CAST($A AS HUGEINT) * (b.bh + p.i) + $B) % $P
         |      AS BIGINT) AS h1
         |  FROM pos0 p JOIN bk b ON b.doc_id = p.doc_id AND b.which = p.which),
         |pos2 AS (
         |  SELECT doc_id, k, which, i,
         |    CAST((CAST($A2 AS HUGEINT) * xor(h1, h1 >> 30)) % $P
         |      AS BIGINT) AS h2
         |  FROM pos1),
         |pos AS MATERIALIZED (
         |  SELECT doc_id, k, which, i, xor(h2, h2 >> 27) AS h FROM pos2),
         |cut AS MATERIALIZED (
         |  SELECT doc_id, which, i FROM (
         |    SELECT doc_id, which, i, k,
         |      row_number() OVER (PARTITION BY doc_id, which ORDER BY h, i)
         |        AS r
         |    FROM pos) z
         |  WHERE r <= k - 1),
         |cl AS MATERIALIZED (
         |  SELECT doc_id,
         |    coalesce(list(i ORDER BY i) FILTER (WHERE which = 1), []) AS c1,
         |    coalesce(list(i ORDER BY i) FILTER (WHERE which = 2), []) AS c2
         |  FROM cut GROUP BY doc_id),
         |bounds AS MATERIALIZED (
         |  SELECT p.doc_id, p.toks, p.n, p.m, p.k,
         |    list_concat(list_concat([CAST(0 AS BIGINT)],
         |      coalesce(cl.c1, [])), [p.m]) AS nb,
         |    list_concat(list_concat([CAST(0 AS BIGINT)],
         |      coalesce(cl.c2, [])), [p.n - p.m]) AS mb
         |  FROM pk p LEFT JOIN cl USING (doc_id)
         |  WHERE p.n >= 2)
         |SELECT doc_id AS $idOut, n AS n_tokens, m AS n_noise, k AS n_spans,
         |  array_to_string([
         |    array_to_string(toks[
         |      CAST(mb[j + 1] + nb[j + 1] + 1 AS INT) :
         |      CAST(mb[j + 2] + nb[j + 1] AS INT)], ' ')
         |      || ' <extra_id_' || j || '>'
         |    FOR j IN range(0, CAST(k AS INT))], ' ') AS input_text,
         |  array_to_string([
         |    '<extra_id_' || j || '> ' ||
         |    array_to_string(toks[
         |      CAST(mb[j + 2] + nb[j + 1] + 1 AS INT) :
         |      CAST(mb[j + 2] + nb[j + 2] AS INT)], ' ')
         |    FOR j IN range(0, CAST(k AS INT))], ' ')
         |    || ' <extra_id_' || k || '>' AS target_text
         |FROM bounds
         |UNION ALL
         |SELECT doc_id AS $idOut, n AS n_tokens, CAST(0 AS BIGINT) AS n_noise,
         |  CAST(0 AS BIGINT) AS n_spans,
         |  array_to_string(toks, ' ') AS input_text, '' AS target_text
         |FROM pk WHERE n < 2""".stripMargin
  }

  def oracleSql: String =
    docToksCtes + ",\n" + corruptionSql("doctoks", "doc_id")

  /** `span_corrupt_chunks`: the collator applied to [[BpeEncode
    * .groupTexts]]'s fixed-length chunks — the reference's ACTUAL
    * composition (tokenize → group_texts → DataCollatorForT5MLM):
    * global token positions from the doc-order cumsum, full chunks
    * reassembled, then the identical hash-deterministic corruption
    * keyed on chunk_id. Every chunk is exactly L tokens, so m and k
    * are constant (round(.15·568) = 85 noise tokens in 28 spans). */
  def chunksOracleSql: String =
    docToksCtes + ",\n" +
      s"""docst AS MATERIALIZED (
         |  SELECT doc_id, toks,
         |    CAST(sum(len(toks)) OVER (ORDER BY doc_id
         |      ROWS UNBOUNDED PRECEDING) - len(toks) AS BIGINT) AS st
         |  FROM doctoks),
         |gtot AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS t FROM doctoks),
         |tokpos AS MATERIALIZED (
         |  SELECT (d.st + i - 1) // ${BpeEncode.GatedChunkLen} AS chunk_id,
         |    d.st + i - 1 AS gpos, d.toks[CAST(i AS INT)] AS tok
         |  FROM docst d CROSS JOIN gtot,
         |    unnest(generate_series(1, len(d.toks))) AS u(i)
         |  WHERE (d.st + i - 1) // ${BpeEncode.GatedChunkLen}
         |    < gtot.t // ${BpeEncode.GatedChunkLen}),
         |chunktoks AS MATERIALIZED (
         |  SELECT chunk_id AS doc_id, list(tok ORDER BY gpos) AS toks
         |  FROM tokpos GROUP BY chunk_id),
         |""".stripMargin + corruptionSql("chunktoks", "chunk_id")
}
