package graft

import org.apache.spark.sql.functions._
import graft.dedup.FsLinkage
import graft.operators.DpRelease

class FsDpSpec extends SparkSpec {
  import spark.implicits._

  test("fs weights: agreement raises, disagreement lowers, asymmetric") {
    FsLinkage.WeightsMicro.foreach { case (wa, wd) =>
      assert(wa > 0 && wd < 0)
    }
    // lang (0.95, 0.25): ln(3.8) ≈ 1.335001 nats
    assert(FsLinkage.WeightsMicro.head._1 === 1335001L)
  }

  test("fs: full agreement classifies link, full disagreement nonlink") {
    val Seq((wa0, _), (wa1, _), (wa2, _)) = FsLinkage.WeightsMicro
    assert(wa0 + wa1 + wa2 >= FsLinkage.LinkThresholdMicro)
    val Seq((_, wd0), (_, wd1), (_, wd2)) = FsLinkage.WeightsMicro
    assert(wd0 + wd1 + wd2 <= FsLinkage.NonLinkThresholdMicro)
  }

  test("fs gated instance: cells partition pairs, weights compose") {
    val got = FsLinkage.linkageDocs(spark, sfDir)
    val rows = got.select($"agree_lang", $"agree_source", $"agree_length",
      $"n_pairs", $"weight_micros", $"cls", $"n_link", $"n_possible",
      $"n_nonlink").as[(Boolean, Boolean, Boolean, Long, Long, String,
      Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val Seq((wa0, wd0), (wa1, wd1), (wa2, wd2)) = FsLinkage.WeightsMicro
    rows.foreach { r =>
      val want = (if (r._1) wa0 else wd0) + (if (r._2) wa1 else wd1) +
        (if (r._3) wa2 else wd2)
      assert(r._5 === want)
    }
    val total = rows.map(_._4).sum
    assert(total === rows.head._7 + rows.head._8 + rows.head._9)
  }

  test("dp table: CDF is monotone, centered, and covers the mass") {
    val t = DpRelease.CumPpm
    assert(t.map(_._2) === t.map(_._2).sorted)
    assert(t.last._2 === 1000000L)
    // symmetric mechanism: P(Z ≤ −1) + P(Z = 0) + P(Z ≥ 1) = 1 with
    // P(Z ≤ −1) = 1 − P(Z ≤ 0) up to ppm rounding
    val cumMinus1 = t.find(_._1 == -1L).get._2
    val cum0 = t.find(_._1 == 0L).get._2
    assert(math.abs((1000000L - cum0) - cumMinus1) <= 2L)
  }

  test("dp gated instance: noise bounded, deterministic, counts hidden") {
    val a = DpRelease.dpCustomerCounts(spark, sfDir)
      .select($"grp", $"n_noisy").as[(Long, Long)].collect().toMap
    val b = DpRelease.dpCustomerCounts(spark, sfDir)
      .select($"grp", $"n_noisy").as[(Long, Long)].collect().toMap
    assert(a === b) // memoized noise: same group, same release
    // true counts per nation ~60 at sf0.001+; noise within ±15 of truth
    val truth = spark.read.parquet(s"$sfDir/customer.parquet")
      .groupBy($"c_nationkey".cast("long")).count()
      .as[(Long, Long)].collect().toMap
    a.foreach { case (g, noisy) =>
      assert(math.abs(noisy - truth(g)) <= 15L, s"nation $g")
    }
  }
}
