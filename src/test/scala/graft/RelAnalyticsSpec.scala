package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Attribution, Basket, Cohort, Histogram}
import graft.dedup.EditDistance
import graft.functions.TextScoring

/** Round-8 relational-analytics batch (registered round 9): as-of join,
  * touch attribution, basket pairs, cohort retention, equi-width
  * histogram, edit-distance blocking, TF-IDF/BM25 scoring. Planted-data
  * semantics here; cross-engine value equality is the DuckDB hash gate. */
class RelAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("asOf attaches the latest right row at-or-before each left ts, per key") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 9L, 90.0))
      .toDF("k", "ts", "price")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts")
      .select("k", "ts", "tag", "price")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // (1,10): right row at EQUAL ts matches (inclusive); (1,20): latest of
    // {10,15} is 15; (2,5): no right row at-or-before => NULL payload
    assert(got == Map((1L, 10L) -> Some(100.0), (1L, 20L) -> Some(150.0),
      (2L, 5L) -> None))
  }

  test("asOf rejects payload and internal-column collisions") {
    val l = Seq((1L, 1L, "x")).toDF("k", "ts", "v")
    val r = Seq((1L, 1L, "y")).toDF("k", "ts", "v")
    intercept[IllegalArgumentException] { AsOfJoin.asOf(l, r, Seq("k"), "ts") }
    val lBad = Seq((1L, 1L, "x")).toDF("k", "ts", "__side")
    val rOk = Seq((1L, 1L, "y")).toDF("k", "ts", "p")
    intercept[IllegalArgumentException] { AsOfJoin.asOf(lBad, rOk, Seq("k"), "ts") }
  }

  test("attribution credits last/first at-or-before touch; no prior touch => direct") {
    // user 7: view@1, click@2, purchase@3 (v=10), purchase@5 (v=20)
    // user 8: purchase@1 (v=5) with only a LATER view@2 => direct
    val ev = Seq(
      (1L, 7L, 1L, "view", 0.0), (2L, 7L, 2L, "click", 0.0),
      (3L, 7L, 3L, "purchase", 10.0), (4L, 7L, 5L, "purchase", 20.0),
      (5L, 8L, 1L, "purchase", 5.0), (6L, 8L, 2L, "view", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    def run(mode: String) =
      Attribution.attribute(ev, "user_id", "ts", "event_type", "value",
          "event_id", Seq("view", "click"), "purchase", mode)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(run("last") == Map("click" -> ((2L, 3000L)), "direct" -> ((1L, 500L))))
    assert(run("first") == Map("view" -> ((2L, 3000L)), "direct" -> ((1L, 500L))))
  }

  test("attribution same-timestamp tie-break is the documented (type asc) order") {
    // click and purchase share ts=1: 'click' < 'purchase' so the click IS
    // visible; a 'view' at the same ts would sort after and is not.
    val ev = Seq((1L, 9L, 1L, "click", 0.0), (2L, 9L, 1L, "purchase", 7.0),
      (3L, 9L, 1L, "view", 0.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Attribution.attribute(ev, "user_id", "ts", "event_type", "value",
        "event_id", Seq("view", "click"), "purchase", "last")
      .collect().map(r => r.getString(0)).toSeq
    assert(got == Seq("click"))
  }

  test("basket pairs: ordered pairs, support floor, and the maxBasket cap") {
    val fact = Seq(
      (1L, "b"), (1L, "a"), (1L, "a"), // tx1 basket {a,b} (dup item folds)
      (2L, "a"), (2L, "b"), (2L, "c"), // tx2 {a,b,c}
      (3L, "x")) // singleton: no pairs
      .toDF("tx", "item")
    val got = Basket.pairSupport(fact, "tx", "item", minSupport = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // only (a,b) reaches support 2; (a,c)/(b,c) appear once
    assert(got == Map(("a", "b") -> 2L))
    // cap: a 3-item basket dies at maxBasket=2, leaving tx1's pair only
    val capped = Basket.pairSupport(fact, "tx", "item", 1L, maxBasket = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped == Set(("a", "b")))
  }

  test("cohort retention: offset-0 row carries cohort size; later offsets count retained") {
    val act = Seq(
      (1L, "2024-01-05"), (1L, "2024-03-02"), // cohort Jan, active Jan+Mar
      (2L, "2024-01-20"),                     // cohort Jan, Jan only
      (3L, "2024-03-09"), (3L, "2024-04-01")) // cohort Mar, Mar+Apr
      .toDF("actor", "d").withColumn("d", col("d").cast("date"))
    val got = Cohort.retentionMonthly(act, "actor", "d")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(("2024-01-01", 0) -> 2L, ("2024-01-01", 2) -> 1L,
      ("2024-03-01", 0) -> 1L, ("2024-03-01", 1) -> 1L))
  }

  test("histogram bins anchor at zero with exact cent sums") {
    val df = Seq(0.49, 0.50, 0.99, 1.00, 2.37).toDF("v")
    val got = Histogram.equiWidth(df, "v", widthCents = 50L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // cents: 49|50,99|100|237 -> bins 0,1,2,4
    assert(got == Map(0L -> ((0L, 1L, 49L)), 1L -> ((50L, 2L, 149L)),
      2L -> ((100L, 1L, 100L)), 4L -> ((200L, 1L, 237L))))
  }

  test("edit-distance blocking finds every planted distance<=1 pair (FN-free)") {
    val docs = Seq(
      (1L, "abcdefgh12345678 tail one"),   // base
      (2L, "abcdefgh12345678 tail two"),   // identical prefix: lev 0
      (3L, "abcdefgX12345678"),            // sub in FIRST half: lev 1
      (4L, "abcdefgh1234567X"),            // sub in SECOND half: lev 1
      (5L, "aXcdefgX12345678"),            // lev 2 from 1/2 (excluded) but lev 1 from 3
      (6L, "short"))                       // under prefixLen, excluded
      .toDF("doc_id", "text")
    val got = EditDistance.nearPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == Map((1L, 2L) -> 0, (1L, 3L) -> 1, (2L, 3L) -> 1,
      (1L, 4L) -> 1, (2L, 4L) -> 1, (3L, 5L) -> 1))
  }

  test("tf-idf and bm25 match hand-computed scores on a tiny corpus") {
    val docs = Seq((1L, "spark spark join"), (2L, "join tree"), (3L, "tree"))
      .toDF("doc_id", "text")
    val tfidf = TextScoring.tfIdf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(4)).toMap
    // N=3; spark: df=1, doc1 tf=2 -> 2*(ln(4/2)+1)*1e6
    val sparkScore = math.rint(2 * (math.log(4.0 / 2.0) + 1) * 1e6).toLong
    // join: df=2 -> 1*(ln(4/3)+1)*1e6 in both docs
    val joinScore = math.rint((math.log(4.0 / 3.0) + 1) * 1e6).toLong
    assert(tfidf((1L, "spark")) == sparkScore)
    assert(tfidf((1L, "join")) == joinScore && tfidf((2L, "join")) == joinScore)

    val bm25 = TextScoring.bm25(docs, "doc_id", "text", Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc3 hits nothing and must be absent; doc1 hits both terms
    assert(!bm25.contains(3L) && bm25(1L)._1 == 2L && bm25(2L)._1 == 1L)
    // hand-check doc2's join contribution: N=3 docs with tokens, df(join)=2,
    // idf=ln(1+(3-2+0.5)/(2+0.5)); tf=1, dl=2, avgdl=(3+2+1)/3=2
    val idf = math.log(1 + 1.5 / 2.5)
    val contrib = math.rint(idf * 1 * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2.0 / 2.0)) * 1e6).toLong
    assert(bm25(2L)._2 == contrib)
  }
}
