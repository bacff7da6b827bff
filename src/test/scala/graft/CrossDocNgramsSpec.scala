package graft

import org.apache.spark.sql.functions._
import graft.dedup.CrossDocNgrams
import graft.functions.{KGramHashes, Native}

/** Planted corpora for the cross-document duplicated-n-gram share:
  * disjoint docs score zero, verbatim copies score full, a shared
  * passage scores exactly its gram span, and short docs emit nothing. */
class CrossDocNgramsSpec extends SparkSpec {
  import spark.implicits._

  private def share(rows: Seq[(Long, String)], k: Int = 3) =
    CrossDocNgrams.duplicatedShare(rows.toDF("doc_id", "text"),
      "doc_id", "text", k)

  test("disjoint documents have zero duplicated share") {
    val r = share(Seq((1L, "a b c d e"), (2L, "f g h i j")))
      .collect().map(x => (x.getLong(0), x.getAs[Long]("dup_permicro")))
    assert(r.toSeq.sortBy(_._1) === Seq((1L, 0L), (2L, 0L)))
  }

  test("verbatim copies are fully duplicated both ways") {
    val r = share(Seq((1L, "a b c d e"), (2L, "a b c d e")))
      .collect().map(x => (x.getLong(0), x.getAs[Long]("dup_permicro")))
    assert(r.toSeq.sortBy(_._1) === Seq((1L, 1000000L), (2L, 1000000L)))
  }

  test("a shared passage marks exactly its covered gram positions") {
    // doc1: 6 tokens → 4 trigrams; doc2 shares the run "x y z" plus
    // context so only the 1 trigram fully inside the shared run dups
    val r = share(Seq((1L, "a b x y z c"), (2L, "p q x y z r")))
      .collect().map(x => (x.getLong(0), x.getAs[Long]("n_grams"),
        x.getAs[Long]("dup_grams"))).toSeq.sortBy(_._1)
    assert(r === Seq((1L, 4L, 1L), (2L, 4L, 1L)))
  }

  test("within-doc repetition alone is NOT cross-doc duplication") {
    val r = share(Seq((1L, "a b c a b c a b c"), (2L, "x y z w v u")))
      .filter(_ => true).collect()
      .map(x => (x.getLong(0), x.getAs[Long]("dup_grams"))).toSeq.sortBy(_._1)
    assert(r === Seq((1L, 0L), (2L, 0L)))
  }

  test("documents shorter than k emit no row; k-token docs emit one gram") {
    val out = share(Seq((1L, "a b"), (2L, "c d e"), (3L, "c d e")))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids === Set(2L, 3L))
    assert(out.filter(col("doc_id") === 2L).head.getAs[Long]("n_grams") === 1L)
  }

  test("kgram expression agrees with winnow token fold on a planted string") {
    val kg = spark.range(1).select(
      Native.call("graft_kgram_hashes_3",
        e => KGramHashes(e.head, 3), lit("a b c d")).as("g"))
      .head.getSeq[Long](0)
    assert(kg.length === 2) // 4 tokens → 2 trigrams
    // manual fold: h(w) = chars·131 mod 1e9+7; gram = ((h1·31+h2)·31+h3) mod
    val h = "abcd".map(c => c.toLong % 1000000007L)
    def gram(a: Long, b: Long, c: Long) =
      ((a * 31 + b) % 1000000007L * 31 + c) % 1000000007L
    assert(kg === Seq(gram(h(0), h(1), h(2)), gram(h(1), h(2), h(3))))
  }

  test("gated instance returns one row per long-enough doc at sf0.001") {
    val n = CrossDocNgrams.crossdocDocuments(spark, sfDir).count()
    assert(n > 0)
  }
}
