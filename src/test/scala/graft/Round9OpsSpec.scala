package graft

import org.apache.spark.sql.functions._
import graft.functions.NgramStats
import graft.operators.{Chunker, GroupStats, PageRank}

/** Round-9 operators: PMI collocations, Gopher repetition signals,
  * unigram-LM surprisal, RAG chunking, integer-micros PageRank,
  * per-group correlation/slope. Planted-data semantics; cross-engine
  * equality is the DuckDB hash gate. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  test("pmi: collocation counts and micros match a hand computation") {
    // "big data" appears 3x; corpus has 8 bigram occurrences total
    val docs = Seq((1L, "big data big data is big data"),
      (2L, "small data lake")).toDF("doc_id", "text")
    val got = NgramStats.pmiBigrams(docs, "doc_id", "text", minCount = 3L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // doc1 tokens [big data big data is big data] -> 6 bigrams:
    // (big,data)x3, (data,big), (data,is), (is,big); doc2 adds 2 -> N=8
    // c(big)=3, c(data)=4; pmi = ln(3*8/(3*4)) = ln 2
    val want = math.rint(math.log(2.0) * 1e6).toLong
    assert(got == Map(("big", "data") -> ((3L, want))))
  }

  test("repetition signals: exact integer counts, single-token doc zero-filled") {
    val docs = Seq((1L, "a b a b a"), (2L, "solo"), (3L, "")).toDF("doc_id", "text")
    val got = NgramStats.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // doc1: 5 tokens, 2 types, top token a=3; bigrams (a,b)x2,(b,a)x2:
    // top bigram 2, dup types 2, dup tokens 4
    assert(got(1L) == ((5L, 2L, 3L, 2L, 2L, 4L)))
    // doc2: one token, no bigrams -> zeros; doc3: no tokens -> absent
    assert(got(2L) == ((1L, 1L, 1L, 0L, 0L, 0L)))
    assert(!got.contains(3L))
  }

  test("surprisal: add-one unigram NLL micros match a hand computation") {
    val docs = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    // counts: x=2, y=2, z=1; N=5, V=3 -> denom 8
    def nll(c: Long) = math.rint(-math.log((c + 1.0) / 8.0) * 1e6).toLong
    val got = NgramStats.docSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val d1 = 2 * nll(2) + nll(2)
    val d2 = nll(2) + nll(1)
    assert(got == Map(1L -> ((3L, d1, d1 / 3)), 2L -> ((2L, d2, d2 / 2))))
  }

  test("chunker: boundary docs produce no redundant tail chunk") {
    val docs = Seq((1L, "a" * 200), (2L, "b" * 210), (3L, "c" * 100),
      (4L, "")).toDF("doc_id", "text")
    val got = Chunker.chunk(docs, "doc_id", "text", size = 200, stride = 150)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(4))).toMap
    // exactly-200 -> ONE chunk; 210 -> two (second 60 chars from offset 150)
    assert(got.keys.count(_._1 == 1L) == 1 && got((1L, 0L)) == ((0L, 200L)))
    assert(got((2L, 0L)) == ((0L, 200L)) && got((2L, 1L)) == ((150L, 60L)))
    assert(got((3L, 0L)) == ((0L, 100L)))
    assert(!got.keys.exists(_._1 == 4L)) // empty doc excluded
    intercept[IllegalArgumentException] {
      Chunker.chunk(docs, "doc_id", "text", size = 100, stride = 150)
    }
  }

  test("pagerank: two integer-micros iterations match the hand-run recurrence") {
    // a->b, a->c, b->a; c dangling (drops mass, documented)
    val e = Seq(("a", "b"), ("a", "c"), ("b", "a")).toDF("src", "dst")
    def run(n: Int) = PageRank.ranks(e, n)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run(1) == Map("a" -> 1000000L, "b" -> 575000L, "c" -> 575000L))
    assert(run(2) == Map("a" -> 638750L, "b" -> 575000L, "c" -> 575000L))
  }

  test("corr/slope: exact linear data gives corr 1.0 and the exact slope; zero variance gives nulls") {
    val df = Seq(("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0),
      ("z", 5.0, 7.0), ("z", 5.0, 9.0)).toDF("grp", "x", "y")
    val rows = GroupStats.corrSlope(df, "grp", "x", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    val g = rows("g")
    assert(g.getLong(g.fieldIndex("n")) == 3L)
    assert(g.getLong(g.fieldIndex("corr_micros")) == 1000000L)
    assert(g.getLong(g.fieldIndex("slope_micros")) == 2000000L)
    val z = rows("z") // x has zero variance -> both undefined
    assert(z.isNullAt(z.fieldIndex("corr_micros")) &&
      z.isNullAt(z.fieldIndex("slope_micros")))
  }
}
