package graft

import org.apache.spark.sql.functions._
import graft.operators.MixturePlan
import graft.dedup.NGramJaccard

class MixContainSpec extends SparkSpec {
  import spark.implicits._

  test("apportion: allocation sums to budget; remainders break ties by source") {
    val got = MixturePlan.apportion(
        Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("src", "w"), "src", "w", 10L)
      .orderBy("source")
      .select($"source", $"floor_n", $"extra", $"alloc_n")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 3L, 1L, 4L), ("b", 3L, 0L, 3L), ("c", 3L, 0L, 3L)))
  }

  test("apportion: largest remainder gets the shortfall") {
    // B=7, w=(2,3,5): quotas/W = 1.4, 2.1, 3.5 -> floors 1,2,3, c wins +1
    val got = MixturePlan.apportion(
        Seq(("a", 2L), ("b", 3L), ("c", 5L)).toDF("src", "w"), "src", "w", 7L)
      .select($"source", $"alloc_n").as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 1L, "b" -> 2L, "c" -> 4L))
    assert(got.values.sum === 7L)
  }

  test("apportion: zero total weight yields an all-zero plan") {
    val got = MixturePlan.apportion(
        Seq(("a", 0L), ("b", 0L)).toDF("src", "w"), "src", "w", 5L)
      .select($"alloc_n").as[Long].collect().toSeq
    assert(got === Seq(0L, 0L))
  }

  test("gated mixture plan sums exactly to the 1M budget") {
    val total = MixturePlan.mixtureDocs(spark, sfDir)
      .agg(sum("alloc_n")).as[Long].head()
    assert(total === 1000000L)
  }

  test("containment: fragment contained in long doc is directional") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"), // 4 trigram shingles
      (2L, "w1 w2 w3")           // 1 shingle, fully inside doc 1
    ).toDF("doc_id", "text")
    val got = NGramJaccard.containmentPairs(docs, "doc_id", "text",
        thresholdPermille = 600, dfCap = 50)
      .select($"a_id", $"b_id", $"n_common", $"n_a", $"containment_permille")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    // only 2→1 passes (1/1 = 1000‰); 1→2 is 1/4 = 250‰
    assert(got === Set((2L, 1L, 1L, 1L, 1000L)))
  }

  test("containment: shingles above the df cap generate no candidates") {
    // the shared shingle appears in 3 docs; cap 2 suppresses the pairs
    val docs = Seq(
      (1L, "x y z"), (2L, "x y z"), (3L, "x y z")
    ).toDF("doc_id", "text")
    val got = NGramJaccard.containmentPairs(docs, "doc_id", "text", 600, dfCap = 2)
    assert(got.isEmpty)
  }

  test("gated containment: every planted truncation is contained in its source") {
    val got = NGramJaccard.containmentDocs(spark, sfDir)
    val planted = got.filter($"a_id" >= 1000000000L && $"b_id" === $"a_id" - 1000000000L)
    assert(planted.count() > 0)
    // directional: containment of the plant in its source is >= 600 permille
    assert(planted.filter($"containment_permille" < 600).isEmpty)
  }
}
