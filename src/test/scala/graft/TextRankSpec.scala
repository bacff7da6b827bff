package graft

import org.apache.spark.sql.functions._
import graft.functions.TextRank

/** Planted graphs for TextRank: edge construction from adjacency,
  * symmetric weights, rank ordering on a star graph, and the isolated
  * two-cliques case. */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("co-occurrence edges: adjacent pairs, symmetric, counted") {
    val docs = Seq("a b c", "b a").toDF("text")
    val e = TextRank.cooccurrenceEdges(docs, "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // a-b occurs twice (a→b and b→a), b-c once; each edge both ways
    assert(e === Set(("a", "b", 2L), ("b", "a", 2L),
      ("b", "c", 1L), ("c", "b", 1L)))
  }

  test("self-loops from repeated words are dropped") {
    val e = TextRank.cooccurrenceEdges(Seq("x x y").toDF("text"), "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(e === Set(("x", "y"), ("y", "x")))
  }

  test("hub of a star graph outranks the leaves") {
    // hub co-occurs with every leaf: "hub leaf_i hub leaf_j..."
    val doc = (1 to 8).map(i => s"hub leaf$i").mkString(" ")
    val kw = TextRank.keywords(Seq(doc).toDF("text"), "text",
      iters = 3, k = 9).collect()
    assert(kw.head.getString(0) === "hub")
    assert(kw.head.getAs[Long]("rk") === 1L)
    assert(kw.head.getAs[Long]("rank_micros") >
      kw.last.getAs[Long]("rank_micros"))
  }

  test("symmetric clique: equal ranks, ties broken by word") {
    val kw = TextRank.keywords(Seq("p q", "q p").toDF("text"), "text",
      iters = 2, k = 2).collect()
    assert(kw.map(_.getString(0)).toSeq === Seq("p", "q"))
    assert(kw(0).getAs[Long]("rank_micros") ===
      kw(1).getAs[Long]("rank_micros"))
  }

  test("rank mass: every rank >= base and bounded by base + damp mass") {
    val docs = Seq("a b c d", "c d e", "e a").toDF("text")
    val r = TextRank.ranks(TextRank.cooccurrenceEdges(docs, "text"), 3)
    assert(r.filter(col("rank_micros") < 150000L).count() === 0)
  }

  test("gated instance: 20 keywords, ranks strictly ordered at sf0.001") {
    val kw = TextRank.textrankDocuments(spark, sfDir).collect()
    assert(kw.length === 20)
    val ranks = kw.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("rank_micros"))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
  }
}
