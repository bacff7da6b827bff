package graft

import org.apache.spark.sql.functions._
import graft.ann.KnnClassify
import graft.dedup.PrefixDedup

class KnnPrefixSpec extends SparkSpec {
  import spark.implicits._

  test("knn classify: planted clusters vote their own label; ties break to least label") {
    // two tight clusters in 2-d (padded to 4): queries sit inside one
    val mk = (base: Float) => Array(base, base, 0f, 0f)
    val corpus = Seq(
      (1L, mk(1.0f), 7), (2L, mk(1.01f), 7), (3L, mk(0.99f), 7),
      (11L, mk(-1.0f), 3), (12L, mk(-1.01f), 3), (13L, mk(-0.99f), 3),
      (100L, mk(1.02f), 5) // lone dissenter near cluster A
    ).toDF("vec_id", "embedding", "label")
    val queries = corpus.filter($"vec_id" === 1L)
    val got = KnnClassify.classify(corpus, queries, "vec_id", "embedding",
        "label", k = 5)
      .as[(Long, Int, Int, Long, Int)].head()
    // neighbors of 1: {2,3,100} cos=1 exactly (colinear), then the
    // opposite cluster; votes: 7->2, 5->1, 3->2 -> count tie 7 vs 3
    // breaks to least label 3? No: (votes desc, label asc) -> 7 and 3
    // both have 2 votes, least label 3 wins.
    assert(got === ((1L, 7, 3, 2L, 5)))
  }

  test("knn classify: clean majority predicts the cluster label") {
    val mk = (a: Float, b: Float) => Array(a, b, 0f, 0f)
    val corpus = Seq(
      (1L, mk(1f, 0f), 7), (2L, mk(0.9f, 0.1f), 7), (3L, mk(0.8f, 0.2f), 7),
      (4L, mk(0.85f, 0.15f), 7), (11L, mk(-1f, 0f), 3), (12L, mk(-0.9f, -0.1f), 3)
    ).toDF("vec_id", "embedding", "label")
    val got = KnnClassify.classify(corpus, corpus.filter($"vec_id" === 1L),
        "vec_id", "embedding", "label", k = 3)
      .as[(Long, Int, Int, Long, Int)].head()
    assert(got._3 === 7 && got._4 === 3L)
  }

  test("prefix dedup: strict prefixes found via sorted adjacency, equals excluded") {
    val docs = Seq(
      (10L, "abc def"), (20L, "abc def ghi"), (30L, "abc def"), // 10 prefix of 20; 30 dup of 10
      (40L, "zzz"), (50L, "ab"), (60L, "xyz")
    ).toDF("doc_id", "text")
    val got = PrefixDedup.prefixDuplicates(docs, "doc_id", "text")
      .as[(Long, Int, Long, Int)].collect().toSet
    // "ab" -> "abc def" (successor), "abc def" -> "abc def ghi"
    assert(got === Set((50L, 2, 10L, 7), (10L, 7, 20L, 11)))
  }

  test("prefix dedup gated instance: every planted truncation is caught") {
    val got = PrefixDedup.prefixDupDocs(spark, sfDir)
    // planted ids (>= 1e9) must appear as prefix docs unless their halved
    // text collided into a longer chain; at minimum the count is positive
    // and every planted id that appears maps to an extension twice its len
    val planted = got.filter($"doc_id" >= 1000000000L)
      .select($"prefix_len", $"ext_len").as[(Int, Int)].collect()
    assert(planted.nonEmpty)
    assert(planted.forall { case (p, e) => e > p })
    // and the planted population is large: most 10th docs have unique halves
    val nTenth = Tables.documents(spark, sfDir)
      .filter($"doc_id" % 10 === 0).count()
    assert(planted.length >= (nTenth * 0.8).toInt)
  }
}
