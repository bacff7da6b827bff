package graft

import org.apache.spark.sql.functions._
import graft.operators.Survival
import graft.functions.FeatureHash

class SurvivalFeatureSpec extends SparkSpec {
  import spark.implicits._

  test("km: hand curve with ties, censor-only step keeps surv exact") {
    val subj = Seq((1, true), (1, true), (2, false), (3, true), (3, false))
      .toDF("dur", "ev")
    val got = Survival.kaplanMeier(subj, "dur", "ev")
      .select($"dur_days", $"n_risk", $"d_events", $"c_censored",
        $"surv_permicro").as[(Int, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(got === Array(
      (1, 5L, 2L, 0L, 600000L),  // 1e6·3/5
      (2, 3L, 0L, 1L, 600000L),  // censor-only: n/n leaves surv EXACT
      (3, 2L, 1L, 1L, 300000L))) // 600000·1/2
  }

  test("km: no censoring drives survival to zero at the last duration") {
    val subj = Seq((5, true), (7, true)).toDF("dur", "ev")
    val got = Survival.kaplanMeier(subj, "dur", "ev")
      .select($"dur_days", $"surv_permicro").as[(Int, Long)]
      .collect().sortBy(_._1)
    assert(got === Array((5, 500000L), (7, 0L)))
  }

  test("km gated instance: monotone non-increasing, risk set accounts") {
    val rows = Survival.survivalEvents(spark, sfDir)
      .orderBy($"dur_days")
      .select($"n_risk", $"d_events", $"c_censored", $"surv_permicro")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 <= a._4)                    // survival never rises
      assert(b._1 === a._1 - a._2 - a._3)     // risk-set countdown
    case _ => }
    assert(rows.map(r => r._2 + r._3).sum === rows.head._1) // all subjects exit
  }

  test("feature hash: hand buckets, signs, and signed counts") {
    // h('a')=97 → bucket 1 sign +1; h('b')=98 → bucket 2 sign +1;
    // h('@')=64 → bucket 0 sign −1 (64 div 32 = 2, even → −1)
    val docs = Seq((1L, "a a b"), (2L, "@ a")).toDF("doc_id", "text")
    val got = FeatureHash.hashedVectors(docs, "doc_id", "text")
      .select($"doc_id", $"bucket", $"weight", $"n_terms")
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, 1, 2L, 2L), (1L, 2, 1L, 1L),
      (2L, 0, -1L, 1L), (2L, 1, 1L, 1L)))
  }

  test("feature hash gated instance: buckets bounded, |weight| ≤ n_terms") {
    val got = FeatureHash.featureHashDocs(spark, sfDir)
    assert(got.filter($"bucket" < 0 || $"bucket" >= FeatureHash.D).isEmpty)
    assert(got.filter(abs($"weight") > $"n_terms").isEmpty)
    assert(got.count() > 0)
  }
}
