package graft

import org.apache.spark.sql.functions._
import graft.operators.GrowthAnalytics

class GrowthSpec extends SparkSpec {
  import spark.implicits._

  test("cohort ltv gated instance: cumulative, and age 0 starts the curve") {
    val got = GrowthAnalytics.cohortLtv(spark, sfDir)
      .select($"cohort_week", $"age_weeks", $"rev_cents", $"cum_rev_cents",
        $"cohort_users", $"ltv_micros_per_user")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // cumulative = running sum of rev by age
      var run = 0L
      sorted.foreach { r =>
        run += r._3
        assert(r._4 === run)
        assert(r._6 === 1000000L * r._4 / r._5)
      }
      assert(sorted.head._2 >= 0L)
    }
  }

  test("abc: cumulative shares partition parts into A/B/C exactly") {
    val got = GrowthAnalytics.abcParts(spark, sfDir)
      .select($"partkey", $"rev_cents", $"cum_rev_cents", $"cls",
        $"total_cents", $"n_a", $"n_b", $"n_c")
      .as[(Long, Long, Long, String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val total = got.head._5
    // the global cumsum is a permutation-free running total: max cum = total
    assert(got.map(_._3).max === total)
    assert(got.map(_._2).sum === total)
    // class boundaries hold row-wise
    got.foreach { r =>
      r._4 match {
        case "A" => assert(10 * r._3 <= 8 * total)
        case "B" => assert(10 * r._3 > 8 * total && 20 * r._3 <= 19 * total)
        case _   => assert(20 * r._3 > 19 * total)
      }
    }
    // counts account for every part
    assert(got.head._6 + got.head._7 + got.head._8 === got.length.toLong)
    // classes are a prefix partition of the revenue order: every A part
    // out-earns (or ties) every B part, every B every C. (This corpus's
    // part revenues are near-uniform, so the A head is wide — the class
    // CUTS, not the head size, are the invariant.)
    val minA = got.filter(_._4 == "A").map(_._2).min
    val maxB = if (got.exists(_._4 == "B")) got.filter(_._4 == "B").map(_._2).max else Long.MinValue
    val maxC = if (got.exists(_._4 == "C")) got.filter(_._4 == "C").map(_._2).max else Long.MinValue
    assert(minA >= maxB && (maxB == Long.MinValue || maxB >= maxC))
  }

  test("abc: two-phase cumsum equals the single-window reference") {
    val got = GrowthAnalytics.abcParts(spark, sfDir)
      .select($"partkey", $"rev_cents", $"cum_rev_cents")
      .as[(Long, Long, Long)].collect()
    val ref = got.sortBy(r => (-r._2, r._1)).scanLeft(0L)(_ + _._2).tail
    assert(got.sortBy(r => (-r._2, r._1)).map(_._3).toSeq === ref.toSeq)
  }
}
