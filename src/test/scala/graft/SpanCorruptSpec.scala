package graft

import org.apache.spark.sql.functions._
import graft.operators.SpanCorrupt

/** T5 span corruption: planted short/boundary/long docs, corruption-rate
  * bounds, strictly increasing sentinels, and exact round-trip
  * re-assembly of the original token sequence. */
class SpanCorruptSpec extends SparkSpec {
  import spark.implicits._

  private def run(toks: Seq[(Long, Seq[String])]) =
    SpanCorrupt.corrupt(toks.toDF("doc_id", "toks"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap

  private val sentinel = "<extra_id_(\\d+)>".r

  /** Splice target spans back into the input at their sentinels; must
    * reproduce the original tokens exactly. */
  private def reassemble(input: String, target: String): Seq[String] = {
    // target = <extra_id_0> t... <extra_id_1> t... <extra_id_k>
    val spans = scala.collection.mutable.Map[Int, Seq[String]]()
    var cur = -1
    var buf = Seq.newBuilder[String]
    target.split(" ").filter(_.nonEmpty).foreach {
      case sentinel(j) =>
        if (cur >= 0) spans(cur) = buf.result()
        cur = j.toInt; buf = Seq.newBuilder[String]
      case t => buf += t
    }
    input.split(" ").filter(_.nonEmpty).flatMap {
      case sentinel(j) => spans.getOrElse(j.toInt, Seq.empty)
      case t => Seq(t)
    }.toSeq
  }

  test("1-token and empty-ish docs pass through uncorrupted") {
    val got = run(Seq((1L, Seq("only")), (2L, Seq("a", "b"))))
    assert(got(1L) === ((1L, 0L, 0L, "only", "")))
    // n=2 -> m=1, k=1: one noise token, and it is the LAST token
    val (n2, m2, k2, in2, tg2) = got(2L)
    assert((n2, m2, k2) === ((2L, 1L, 1L)))
    assert(in2 === "a <extra_id_0>")
    assert(tg2 === "<extra_id_0> b <extra_id_1>")
  }

  test("corruption rate tracks noise_density 0.15 within the declared clamps") {
    val docs = Seq(
      (10L, (1 to 40).map(i => s"t$i")),
      (11L, (1 to 100).map(i => s"w$i")),
      (12L, (1 to 400).map(i => s"u$i")))
    run(docs).foreach { case (_, (n, m, _, _, _)) =>
      // m = round-half-up(0.15 n) exactly for these n
      assert(m === (3 * n + 10) / 20)
      assert(math.abs(m.toDouble / n - 0.15) <= 0.5 / n + 1e-9)
    }
  }

  test("sentinels strictly increase in both input and target; target ends with the k-th") {
    val docs = Seq((20L, (1 to 120).map(i => s"x$i")))
    val (_, _, k, input, target) = run(docs)(20L)
    assert(k >= 2) // the multi-span branch actually fires
    val inIds = sentinel.findAllMatchIn(input).map(_.group(1).toInt).toSeq
    val tgIds = sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq
    assert(inIds === (0 until k.toInt))
    assert(tgIds === (0 to k.toInt))
    assert(target.endsWith(s"<extra_id_$k>"))
  }

  test("round-trip: splicing target spans into the input reproduces the tokens") {
    val docs = Seq(
      (30L, (1 to 7).map(i => s"a$i")),    // k=1 short
      (31L, (1 to 34).map(i => s"b$i")),   // k boundary
      (32L, (1 to 250).map(i => s"c$i")))  // many spans
    val got = run(docs)
    docs.foreach { case (id, toks) =>
      val (_, _, _, input, target) = got(id)
      assert(reassemble(input, target) === toks, s"doc $id")
    }
  }

  test("span count and segment sizes: k spans, every segment >= 1 token") {
    val docs = Seq((40L, (1 to 200).map(i => s"z$i")))
    val (n, m, k, input, target) = run(docs)(40L)
    assert(k === math.max(1L, math.min((2 * m + 3) / 6, math.min(m, n - m))))
    // input carries n - m real tokens + k sentinels
    val inToks = input.split(" ").filter(_.nonEmpty)
    assert(inToks.length.toLong === (n - m) + k)
    // target carries m real tokens + k+1 sentinels
    val tgToks = target.split(" ").filter(_.nonEmpty)
    assert(tgToks.length.toLong === m + k + 1)
    // no empty noise span: no two adjacent sentinels in the target
    tgToks.sliding(2).foreach { w =>
      assert(!(sentinel.pattern.matcher(w(0)).matches() &&
        sentinel.pattern.matcher(w(1)).matches()), "empty noise span")
    }
    // no empty nonnoise segment: input never starts with a sentinel and
    // never holds two adjacent sentinels
    assert(!sentinel.pattern.matcher(inToks.head).matches())
    inToks.sliding(2).foreach { w =>
      assert(!(sentinel.pattern.matcher(w(0)).matches() &&
        sentinel.pattern.matcher(w(1)).matches()), "empty nonnoise segment")
    }
  }

  test("chunked composition: every chunk is exactly L tokens with constant m, k") {
    val got = SpanCorrupt.spanCorruptChunks(spark, sfDir).collect()
    assert(got.nonEmpty)
    val L = graft.functions.BpeEncode.GatedChunkLen
    got.foreach { r =>
      assert(r.getAs[Long]("n_tokens") === L)
      assert(r.getAs[Long]("n_noise") === (3 * L + 10) / 20) // 85
      val m = (3 * L + 10) / 20
      assert(r.getAs[Long]("n_spans") === (2 * m + 3) / 6) // 28
    }
    // chunk ids are dense 0..n-1 (full chunks only, remainder dropped)
    val ids = got.map(_.getAs[Long]("chunk_id")).sorted
    assert(ids.toSeq === (0L until ids.length).toSeq)
  }

  test("gated instance is deterministic across runs") {
    val a = SpanCorrupt.spanCorruptDocs(spark, sfDir).orderBy("doc_id")
      .collect().map(_.toString)
    val b = SpanCorrupt.spanCorruptDocs(spark, sfDir).orderBy("doc_id")
      .collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
