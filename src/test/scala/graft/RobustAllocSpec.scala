package graft

import org.apache.spark.sql.functions._
import graft.operators.{Allocation, GraphMetrics, RfmSegment, Survival, TheilSen}

class RobustAllocSpec extends SparkSpec {
  import spark.implicits._

  // ---- Resource-Allocation link prediction ----

  test("RA links: square graph predicts both diagonals at 1/2 + 1/2") {
    // cycle 1-2-3-4-1: non-edges (1,3) and (2,4), each with two
    // degree-2 common neighbors -> ra = 2 * (1000000 div 2)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val got = GraphMetrics.resourceAllocationLinks(e, 10)
      .as[(Long, Long, Long, Long, Int)].collect().toSeq
    assert(got === Seq((1L, 3L, 2L, 1000000L, 1), (2L, 4L, 2L, 1000000L, 2)))
  }

  test("RA links: existing edges are never candidates; deg divides exactly") {
    // path 1-2-3 plus hub 2-4: candidates are the pairs through hub 2
    // (deg 3): ra = 1000000 div 3 = 333333
    val e = Seq((1L, 2L), (2L, 3L), (2L, 4L)).toDF("u", "v")
    val got = GraphMetrics.resourceAllocationLinks(e, 10)
      .as[(Long, Long, Long, Long, Int)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._4)).toSet ===
      Set((1L, 3L, 333333L), (1L, 4L, 333333L), (3L, 4L, 333333L)))
    assert(got.map(_._5).sorted === Seq(1, 2, 3))
  }

  // ---- Theil-Sen ----

  test("Theil-Sen: exact line recovers slope and intercept") {
    val pts = (0 to 4).map(x => ("a", x, 2L * x + 1)).toDF("g", "x", "y")
    val got = TheilSen.fit(pts, "g", "x", "y")
      .as[(String, Long, Long, Long, Long)].head()
    assert(got === (("a", 5L, 10L, 2000000L, 1000000L)))
  }

  test("Theil-Sen: one wild outlier cannot move the median slope") {
    val pts = (Seq(("a", 0, 1L), ("a", 1, 3L), ("a", 2, 5L), ("a", 3, 7L),
      ("a", 4, 1000L))).toDF("g", "x", "y")
    val got = TheilSen.fit(pts, "g", "x", "y")
      .as[(String, Long, Long, Long, Long)].head()
    // 6 of 10 pairwise slopes are exactly 2; lower median stays 2
    assert(got._4 === 2000000L)
    // residual levels: 1e6 x4 and 992e6; lower median (3rd) = 1e6
    assert(got._5 === 1000000L)
  }

  test("Theil-Sen: negative slope sign-splits the truncating div") {
    val pts = (0 to 3).map(x => ("d", x, 10L - 3L * x)).toDF("g", "x", "y")
    val got = TheilSen.fit(pts, "g", "x", "y")
      .as[(String, Long, Long, Long, Long)].head()
    assert(got._4 === -3000000L)
    assert(got._5 === 10000000L)
  }

  // ---- Nelson-Aalen ----

  test("Nelson-Aalen: hand-walked risk sets and hazard increments") {
    val subj = Seq((1, true), (1, true), (2, false), (3, true))
      .toDF("dur", "ev")
    val got = Survival.nelsonAalen(subj, "dur", "ev")
      .orderBy("dur_days").as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1, 4L, 2L, 0L, 500000L),   // 2/4
      (2, 2L, 0L, 1L, 500000L),   // censor only: hazard unchanged
      (3, 1L, 1L, 0L, 1500000L))) // + 1/1
  }

  test("Nelson-Aalen agrees with KM risk sets on the same frame") {
    val subj = Seq((1, true), (2, true), (2, false), (5, true), (5, false))
      .toDF("dur", "ev")
    val km = Survival.kaplanMeier(subj, "dur", "ev")
      .select("dur_days", "n_risk").as[(Int, Long)].collect().toSet
    val na = Survival.nelsonAalen(subj, "dur", "ev")
      .select("dur_days", "n_risk").as[(Int, Long)].collect().toSet
    assert(na === km)
  }

  // ---- Neyman allocation ----

  test("Neyman: weights are sqrt(SS) exactly and floors+remainders sum to n") {
    // stratum a: {0,2} -> SS = 2*4 - 4 = 4,  w = 2
    // stratum b: {0,4} -> SS = 2*16 - 16 = 16, w = 4
    val df = Seq(("a", 0L), ("a", 2L), ("b", 0L), ("b", 4L))
      .toDF("s", "v")
    val got = Allocation.neyman(df, "s", "v", 9L)
      .orderBy("stratum")
      .as[(String, Long, String, String, Long)].collect().toSeq
    assert(got === Seq(("a", 2L, "4", "2", 3L), ("b", 2L, "16", "4", 6L)))
  }

  test("Neyman: largest-remainder top-up lands deterministically, sum exact") {
    // three identical strata, n=10 -> floors 3,3,3, one +1 to least key
    val df = Seq(("a", 0L), ("a", 2L), ("b", 0L), ("b", 2L),
      ("c", 0L), ("c", 2L)).toDF("s", "v")
    val got = Allocation.neyman(df, "s", "v", 10L)
      .orderBy("stratum").as[(String, Long, String, String, Long)]
      .collect().toSeq
    assert(got.map(_._5) === Seq(4L, 3L, 3L))
    assert(got.map(_._5).sum === 10L)
  }

  test("Neyman: isqrt is exact beyond double precision") {
    // values chosen so SS = (10^9)^2 * 2 - ... exercises the Newton
    // clamp far above 2^53: stratum of {0, 10^9} ->
    // SS = 2*10^18 - 10^18 = 10^18, w = 10^9 exactly
    val df = Seq(("x", 0L), ("x", 1000000000L), ("y", 0L), ("y", 1L))
      .toDF("s", "v")
    val got = Allocation.neyman(df, "s", "v", 100L)
      .orderBy("stratum").as[(String, Long, String, String, Long)]
      .collect().toSeq
    assert(got.head._4 === "1000000000")
    assert(got.map(_._5).sum === 100L)
  }

  // ---- RFM ----

  test("RFM quintile contract: distinct values tile 1..5, ties share") {
    val label = RfmSegment.segmentLabel(lit(5), lit(5), lit(5))
    assert(Seq(1).toDF("z").select(label).as[String].head() === "champion")
    assert(Seq(1).toDF("z").select(
      RfmSegment.segmentLabel(lit(1), lit(1), lit(1))).as[String].head()
      === "hibernating")
    assert(Seq(1).toDF("z").select(
      RfmSegment.segmentLabel(lit(3), lit(3), lit(5))).as[String].head()
      === "big_spender")
    assert(Seq(1).toDF("z").select(
      RfmSegment.segmentLabel(lit(2), lit(3), lit(2))).as[String].head()
      === "at_risk")
    assert(Seq(1).toDF("z").select(
      RfmSegment.segmentLabel(lit(3), lit(3), lit(3))).as[String].head()
      === "regular")
  }
}
