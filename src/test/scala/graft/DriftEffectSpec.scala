package graft

import org.apache.spark.sql.functions._
import graft.operators.{Contingency, Drift}

class DriftEffectSpec extends SparkSpec {
  import spark.implicits._

  test("w1: identical arms score zero, a unit shift scores exactly 1e6") {
    val same = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("g", "v")
    val r0 = Drift.wasserstein1(same, "v", "g", "a", "b")
      .select($"w1_micro").as[Long].head()
    assert(r0 === 0L)
    // arm b = arm a shifted by +1 → every unit of mass moves distance 1
    val shift = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L)).toDF("g", "v")
    val r1 = Drift.wasserstein1(shift, "v", "g", "a", "b")
      .select($"w1_micro").as[Long].head()
    assert(r1 === 1000000L)
  }

  test("w1: unequal arm sizes use the common-denominator CDFs") {
    // a = {0}, b = {0, 2}: W1 = ∫|F_a − F_b| = |1 − 1/2| at v∈[0,2) = 1
    val df = Seq(("a", 0L), ("b", 0L), ("b", 2L)).toDF("g", "v")
    val r = Drift.wasserstein1(df, "v", "g", "a", "b")
      .select($"n_a", $"n_b", $"w1_micro").as[(Long, Long, Long)].head()
    assert(r === ((1L, 2L, 1000000L)))
  }

  test("w1 gated instance: near-identical generator arms score small") {
    val r = Drift.wassersteinLineitem(spark, sfDir)
      .select($"w1_micro").as[Long].head()
    assert(r >= 0L && r < 1000000L, s"w1 $r") // well under one unit step
  }

  test("cramers v2: independent grid scores near zero, bounded by 1e6") {
    val df = (0 until 400).map(i => (s"r${i % 4}", s"c${i % 5}"))
      .toDF("a", "b") // perfectly balanced → chi2 = 0
    val r = Contingency.cramersV2(df, "a", "b")
      .select($"n_rows", $"n_cols", $"cramers_v2_micro")
      .as[(Long, Long, Long)].head()
    assert(r === ((4L, 5L, 0L)))
  }

  test("cramers v2: a perfectly associated grid scores 1e6") {
    val df = (0 until 300).map(i => (s"x${i % 3}", s"y${i % 3}"))
      .toDF("a", "b") // bijective association
    val r = Contingency.cramersV2(df, "a", "b")
      .select($"cramers_v2_micro").as[Long].head()
    // chi2 = N·min(r−1,c−1) exactly at perfect association (micros
    // rounding of the per-cell contributions can shave the last digit)
    assert(r >= 999998L && r <= 1000000L, s"v2 $r")
  }

  test("cramers gated instance: one row, effect bounded") {
    val r = Contingency.cramersV2Orders(spark, sfDir)
      .select($"cramers_v2_micro").as[Long].collect()
    assert(r.length === 1 && r.head >= 0L && r.head <= 1000000L)
  }

  test("pinball: the quantile losses recombine to the absolute loss") {
    import graft.operators.Forecast
    val pin = Forecast.pinballLoss(spark, sfDir)
      .select($"tau10", $"n_eval", $"total_loss10")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(pin.keySet === Set(1L, 5L, 9L))
    // every τ scores the same eval frame
    assert(pin.values.map(_._2).toSet.size === 1)
    // L(τ) + L(1−τ) = Σ|d| at any τ ⇒ L(.1) + L(.9) = 2·L(.5), exactly
    assert(pin(1L)._3 + pin(9L)._3 === 2L * pin(5L)._3)
    assert(pin(5L)._3 > 0L)
  }
}
