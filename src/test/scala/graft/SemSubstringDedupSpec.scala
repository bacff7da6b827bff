package graft

import org.apache.spark.sql.functions._
import graft.dedup.{SemDedup, SubstringDedup}

/** Planted ground truths for the round-15 dedup additions: SemDeDup's
  * cluster-then-prune contract and the exact-substring repeated-window
  * signal. */
class SemSubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // ---- SemDeDup ----

  /** Two tight clusters on orthogonal axes + one outlier per cluster.
    * Within each cluster the three tight vectors are near-identical
    * (cosine ≈ 1); the outlier is ~45° away (cosine ≈ 0.707 to the
    * axis). At τ = 0.9 the tight copies dedup against the lowest id
    * and the outliers survive. */
  private def planted = Seq(
    // cluster around +x: ids 0 (seed), 2, 3 near-identical; 4 diagonal
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.99f, 0.01f, 0.0f, 0.0f)),
    (3L, Array(0.98f, 0.02f, 0.0f, 0.0f)),
    (4L, Array(0.7f, 0.7f, 0.0f, 0.0f)),
    // cluster around +z: ids 1 (seed), 5, 6 near-identical; 7 diagonal
    (1L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (5L, Array(0.0f, 0.01f, 0.99f, 0.0f)),
    (6L, Array(0.0f, 0.02f, 0.98f, 0.0f)),
    (7L, Array(0.0f, 0.0f, 0.7f, 0.7f))
  ).toDF("vec_id", "embedding")

  test("semdedup: near-identical vectors dedup within clusters, outliers survive") {
    val out = SemDedup.semdedup(planted, "vec_id", "embedding",
        k = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out.size == 8)
    // lowest id in each cluster is never a dup (nothing below it)
    assert(!out(0L)._3 && !out(1L)._3)
    // the near-identical copies are dups of their cluster's lowest id
    assert(out(2L)._3 && out(3L)._3, s"x-cluster copies must dedup: $out")
    assert(out(5L)._3 && out(6L)._3, s"z-cluster copies must dedup: $out")
    // the ~45° outliers are below τ=0.9 against everything kept
    assert(!out(4L)._3 && !out(7L)._3, s"outliers must survive: $out")
    // the two clusters actually separated (4 members each)
    assert(out.values.map(_._2).toSet == Set(4L))
  }

  test("semdedup: τ=0 collapses each cluster to its lowest id (all-dup)") {
    val out = SemDedup.semdedup(planted, "vec_id", "embedding",
        k = 2, tau = 0.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // every non-minimal member has SOME lower-id neighbor with cos ≥ 0
    // (all planted coordinates are nonnegative)
    assert(!out(0L) && !out(1L))
    assert(Seq(2L, 3L, 4L, 5L, 6L, 7L).forall(out(_)))
  }

  test("semdedup gated instance: schema, cluster count, dup monotonicity") {
    val out = SemDedup.semdedupEmbeddings(spark, sfDir).localCheckpoint()
    assert(out.columns.toSeq ==
      Seq("vec_id", "cluster", "n_cluster", "is_dup"))
    assert(out.count() == Tables.embeddings(spark, sfDir).count(),
      "every vector is assigned and flagged exactly once")
    // cluster sizes sum to the corpus
    val sizes = out.groupBy("cluster").count().collect()
    assert(sizes.map(_.getLong(1)).sum == out.count())
  }

  // ---- exact-substring repeated windows ----

  test("substring: a shared 8-token run is flagged in both docs, unique text is not") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 tokens
    val docs = Seq(
      (1L, s"one two three four $shared five six seven"),
      (2L, s"$shared nine ten eleven twelve thirteen fourteen fifteen"),
      (3L, "totally different words with no overlap at all here friend")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.repeatedWindowStats(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1: 4+8+3 = 15 tokens ⇒ 8 windows; exactly ONE (positions
    // 5..12) is the shared run. doc 2: 8+7 = 15 tokens ⇒ 8 windows,
    // one shared (positions 1..8).
    assert(out(1L)._1 == 8L && out(1L)._2 == 1L, s"doc1: ${out(1L)}")
    assert(out(2L)._1 == 8L && out(2L)._2 == 1L, s"doc2: ${out(2L)}")
    assert(out(1L)._3 == 125000L, "1/8 windows repeated = 125000 ppm")
    assert(out(3L)._2 == 0L && out(3L)._3 == 0L, "unique doc has no repeats")
  }

  test("substring: within-doc self-repetition does not count as cross-doc") {
    val run = "a b c d e f g h"
    val docs = Seq(
      (1L, s"$run x $run"), // the run twice in ONE doc
      (2L, "p q r s t u v w x y z unique tokens only here now")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.repeatedWindowStats(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 0L, "cross-doc means n_docs ≥ 2, not multiplicity")
  }

  test("substring: docs shorter than L are excluded on both engines") {
    val docs = Seq((1L, "only seven tokens live here right now"),
      (2L, "eight tokens exactly one two three four five")).toDF("doc_id", "text")
    val out = SubstringDedup.repeatedWindowStats(docs, "doc_id", "text", 8)
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L))
    assert(out.head.getLong(1) == 1L) // exactly one window
  }
}
