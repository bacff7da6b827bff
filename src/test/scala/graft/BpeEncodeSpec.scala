package graft

import org.apache.spark.sql.functions._
import graft.functions.{BpeEncode, BpeMerges}

/** BPE application: greedy pass semantics, learn→encode round-trip on
  * the training corpus's own merges, and the pack-on-real-tokens twin. */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerges is greedy leftmost non-overlapping, one pass per merge") {
    // l == r chains: [a,a,a] + (a,a) -> [aa, a], not [a, aa]
    assert(BpeEncode.applyMerges("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    // consecutive matches both fire: [a,b,a,b] -> [ab, ab]
    assert(BpeEncode.applyMerges("abab", Seq(("a", "b"))) == Seq("ab", "ab"))
    // later merges act on earlier merge OUTPUT symbols
    assert(BpeEncode.applyMerges("abc", Seq(("a", "b"), ("ab", "c"))) ==
      Seq("abc"))
    // a merge learned later never re-applies inside the same pass:
    // (a,ab) on [a,a,b] - pass for (a,b) first makes [a,ab], then merge
    assert(BpeEncode.applyMerges("aab", Seq(("a", "b"), ("a", "ab"))) ==
      Seq("aab"))
    // symbols are codepoints: astral chars never split into surrogates
    assert(BpeEncode.applyMerges("😀x", Nil) ==
      Seq("😀", "x"))
  }

  test("encode round-trips the training corpus's own merges") {
    // planted corpus: "erer" x3 + "xy" -> merges (e,r) then (er,er)
    val docs = Seq((1L, "erer erer xy"), (2L, "erer qq")).toDF("doc_id", "text")
    val merges = BpeMerges.topMerges(docs, "text", k = 2)
      .orderBy("merge_rank").as[(Int, String, String, Long)].collect()
    assert(merges.map(m => (m._2, m._3)).toSeq == Seq(("e", "r"), ("er", "er")))
    val vocab = BpeEncode.vocabTokens(docs, "text", k = 2)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    // applying the learned table re-produces the merged symbols exactly
    assert(vocab("erer") == ((1L, "erer")))
    assert(vocab("xy") == ((2L, "x y")))
    assert(vocab("qq") == ((2L, "q q")))
    val enc = BpeEncode.encode(docs, "doc_id", "text", k = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(enc(1L) == ((3L, 1L + 1L + 2L)))
    assert(enc(2L) == ((2L, 1L + 2L)))
  }

  test("gated instance: merges strictly shrink token counts vs chars") {
    val enc = BpeEncode.bpeEncodeDocs(spark, sfDir)
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", size(split(lower($"text"), "\\s+")).cast("long").as("nw"),
        length(regexp_replace($"text", "\\s", "")).cast("long").as("nc"))
    val j = enc.join(docs, "doc_id")
      .select($"doc_id", $"n_words", $"n_tokens", $"nw", $"nc").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val (nWords, nTokens, nw, nc) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(nWords == nw, s"word count mismatch on doc ${r.getLong(0)}")
      // a token is ≥1 codepoint and every word is ≥1 token
      assert(nTokens >= nWords && nTokens <= nc)
    }
    // the 6 learned merges strictly reduced the corpus below its raw
    // non-whitespace codepoint count
    val totalToks = j.map(_.getLong(2)).sum
    val totalCharsNoWs = j.map(_.getLong(4)).sum
    assert(totalToks < totalCharsNoWs)
  }

  test("token_pack_bpe: offsets cycle within the 512 budget and cumsum ties out") {
    val out = BpeEncode.tokenPackBpeDocs(spark, sfDir)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    var cum = 0L
    out.foreach { case (_, n, packId, off) =>
      assert(packId == cum / 512 && off == cum % 512)
      cum += n
    }
  }

  test("bpe_fertility: per-source pools tie out against the encode output") {
    val enc = graft.functions.BpeEncode.bpeEncodeDocs(spark, sfDir)
      .localCheckpoint()
    val fert = graft.functions.BpeEncode
      .bpeFertility(enc, graft.Tables.documents(spark, sfDir),
        "doc_id", "source")
      .collect()
    assert(fert.nonEmpty)
    val encTotals = enc.agg(org.apache.spark.sql.functions.sum("n_words"),
      org.apache.spark.sql.functions.sum("n_tokens")).collect()(0)
    assert(fert.map(_.getLong(2)).sum === encTotals.getLong(0),
      "source words sum to corpus words")
    assert(fert.map(_.getLong(3)).sum === encTotals.getLong(1))
    fert.foreach { r =>
      val (nw, nt, f, tpd) = (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
      assert(f === 1000L * nt / nw, "fertility is the floored pooled ratio")
      assert(f >= 1000L, "a token count below one per word is impossible")
      assert(tpd === 1000L * nt / r.getLong(1))
    }
  }

  test("ctx_budget: exact order-statistic percentile + truncation accounting") {
    import org.apache.spark.sql.functions._
    // lengths 1..100: p90 (permille 900) index = (900*100+500)/1000 = 90
    // -> budget = the 90th smallest = 90
    val enc = (1L to 100L).map(i => (i, i)).toDF("doc_id", "n_tokens")
    val r = graft.functions.BpeEncode.ctxBudget(enc, 900L).collect()(0)
    assert(r.getAs[Long]("budget_tokens") === 90L)
    assert(r.getAs[Long]("n_truncated") === 10L)
    // dropped = sum(91..100) - 10*90 = 955 - 900 = 55
    assert(r.getAs[Long]("tokens_dropped") === 55L)
    // pad = sum(90 - i for i in 1..89) = 90*89 - 89*90/2 = 4005
    assert(r.getAs[Long]("pad_tokens") === 4005L)
    assert(r.getAs[Long]("tokens_kept") ===
      (1L to 89L).sum + 11L * 90L)
    // p100 never truncates
    val full = graft.functions.BpeEncode.ctxBudget(enc, 1000L).collect()(0)
    assert(full.getAs[Long]("budget_tokens") === 100L)
    assert(full.getAs[Long]("n_truncated") === 0L)
  }

  test("group_texts: docs split across chunks, remainder dropped") {
    import org.apache.spark.sql.functions._
    // streams: doc1 [0,3), doc2 [3,8), doc3 [8,12), doc4 [12,13)
    // L=4, total 13 -> 3 full chunks; the 1-token tail chunk is DROPPED
    val enc = Seq((1L, 3L), (2L, 5L), (3L, 4L), (4L, 1L))
      .toDF("doc_id", "n_tokens")
    val got = graft.functions.BpeEncode.groupTexts(enc, "doc_id", "n_tokens", 4L)
      .collect().map(r => r.getAs[Long]("chunk_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("first_doc_id"),
          r.getAs[Long]("last_doc_id"), r.getAs[Long]("tokens_from_first"),
          r.getAs[Long]("tokens_from_last")))).toMap
    assert(got.keySet === Set(0L, 1L, 2L))
    assert(got(0L) === ((2L, 1L, 2L, 3L, 1L))) // doc1 whole + doc2 head
    assert(got(1L) === ((1L, 2L, 2L, 4L, 4L))) // doc2 middle alone
    assert(got(2L) === ((1L, 3L, 3L, 4L, 4L))) // doc3 whole
    // conservation over FULL chunks: every kept chunk owns exactly L
    val tot = graft.functions.BpeEncode.groupTexts(enc, "doc_id", "n_tokens", 4L)
    // per-chunk overlap sums = L requires re-deriving ov; proxy: the
    // boundary accounting above pins chunk 0's split exactly
    assert(tot.count() === 3L)
  }

  test("pack_boundaries: manifest reconstructs the pack layout") {
    import org.apache.spark.sql.functions._
    // three docs of 300 tokens into 512-packs: starts 0, 300, 600
    val docs = Seq((1L, 300L), (2L, 300L), (3L, 300L))
      .toDF("doc_id", "n_tokens")
    val packed = graft.operators.TokenPack.pack(docs, "doc_id", "n_tokens", 512L)
    val m = graft.functions.BpeEncode.packBoundaries(packed, 512L)
      .collect().map(r => r.getAs[Long]("pack_id") ->
        ((r.getAs[Long]("n_docs_start"), r.getAs[String]("boundaries"),
          r.getAs[Int]("opens_mid_doc")))).toMap
    // pack 0: docs 1 (off 0) and 2 (off 300); pack 1: doc 3 (off 88,
    // since 600 - 512), opening mid-doc (doc 2 spills in)
    assert(m(0L) === ((2L, "0,300", 0)))
    assert(m(1L) === ((1L, "88", 1)))
  }

  test("pack_boundaries: interior packs of a long doc get empty rows") {
    import org.apache.spark.sql.functions._
    // doc 1 starts pack 0 at 0 and runs 1200 tokens: covers packs 0,1,2
    // entirely/partially; doc 2 starts in pack 2 (offset 176)
    val docs = Seq((1L, 1200L), (2L, 100L)).toDF("doc_id", "n_tokens")
    val packed = graft.operators.TokenPack.pack(docs, "doc_id", "n_tokens", 512L)
    val m = graft.functions.BpeEncode.packBoundaries(packed, 512L)
      .collect().map(r => r.getAs[Long]("pack_id") ->
        ((r.getAs[Long]("n_docs_start"), r.getAs[Long]("tokens_started"),
          r.getAs[String]("boundaries"), r.getAs[Int]("opens_mid_doc")))).toMap
    assert(m.keySet === Set(0L, 1L, 2L))
    assert(m(0L) === ((1L, 1200L, "0", 0)))
    // pack 1 is fully interior to doc 1: present, empty, mid-doc
    assert(m(1L) === ((0L, 0L, "", 1)))
    assert(m(2L) === ((1L, 100L, "176", 1)))
  }
}
