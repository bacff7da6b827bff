package graft

import graft.operators.{PpsSample, Skyline, TrendTests}
import org.apache.spark.sql.functions._

/** Planted contracts for the second round-14 operator wave: exact
  * Mann-Kendall S on monotone and tied series, Friedman on a
  * consistent-vs-scrambled ranking, skyline dominance edge cases, and
  * PPS hit counts including the certainty-unit multiplicity. */
class TrendSkylinePpsSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Seq[Long]) =
    vals.zipWithIndex.map { case (v, i) => ("g", i + 1L, v) }
      .toDF("g", "idx", "v")

  test("mann-kendall: strictly increasing series has S = n(n-1)/2") {
    val n = 12
    val out = TrendTests.mannKendall(
      series((1 to n).map(_.toLong * 10)), "g", "idx", "v").collect()(0)
    assert(out.getAs[Long]("s_stat") == n.toLong * (n - 1) / 2)
    assert(out.getAs[Long]("z_permicro") > 0)
  }

  test("mann-kendall: constant series has zero variance -> NULL z") {
    val out = TrendTests.mannKendall(
      series(Seq.fill(10)(7L)), "g", "idx", "v").collect()(0)
    assert(out.getAs[Long]("s_stat") == 0L)
    assert(out.getAs[String]("var18") == "0")
    assert(out.isNullAt(out.fieldIndex("z_permicro")))
  }

  test("mann-kendall: tie correction shrinks var18 exactly") {
    // 1,1,2,2: n=4 → n(n-1)(2n+5) = 4·3·13 = 156; two tie groups of 2
    // each subtract 2·1·9 = 18 → var18 = 120; S = 4 (all cross pairs up)
    val out = TrendTests.mannKendall(
      series(Seq(1L, 1L, 2L, 2L)), "g", "idx", "v").collect()(0)
    assert(out.getAs[Long]("s_stat") == 4L)
    assert(out.getAs[String]("var18") == "120")
  }

  test("friedman: a consistent ranking maximizes chi2, k known") {
    // 4 blocks, 3 treatments, t3 > t2 > t1 in every block:
    // doubled rank sums 8, 16, 24 → chi2 = 12·4·(… ) = 8 exactly
    // (classic max for n=4, k=3: n(k-1) wait — compute: ΣR² = 4²+8²+12²
    //  = 224; 12·224/(4·3·4) − 3·4·4 = 56 − 48 = 8)
    val cells = (1 to 4).flatMap(b => Seq(
      (b.toLong, "t1", 10L + b), (b.toLong, "t2", 100L + b),
      (b.toLong, "t3", 1000L + b))).toDF("blk", "trt", "v")
    val out = TrendTests.friedman(cells, "blk", "trt", "v").collect()(0)
    assert(out.getAs[Long]("n_blocks") == 4L)
    assert(out.getAs[Long]("k_treatments") == 3L)
    assert(out.getAs[Long]("chi2_permicro") == 8000000L)
  }

  test("friedman: incomplete blocks are dropped") {
    val cells = (Seq((1L, "t1", 1L), (1L, "t2", 2L), (2L, "t1", 1L))
      ).toDF("blk", "trt", "v") // block 2 misses t2
    val out = TrendTests.friedman(cells, "blk", "trt", "v").collect()(0)
    assert(out.getAs[Long]("n_blocks") == 1L)
  }

  test("skyline: dominance, incomparability, and duplicates") {
    val pts = Seq(
      ("a", 5L, 10L), ("b", 3L, 20L), ("c", 5L, 5L), // c dominated by a
      ("d", 2L, 20L),                               // d dominated by b
      ("e", 5L, 10L)                                // duplicate of a: survives
    ).toDF("id", "x", "y")
    val out = Skyline.skyline2d(pts, "x", "y").select("id")
      .as[String].collect().toSet
    assert(out == Set("a", "b", "e"),
      s"a/e (5,10) and b (3,20) are incomparable maxima; got $out")
  }

  test("skyline: single best point dominates everything") {
    val pts = Seq(("a", 9L, 9L), ("b", 3L, 8L), ("c", 8L, 3L))
      .toDF("id", "x", "y")
    val out = Skyline.skyline2d(pts, "x", "y").select("id")
      .as[String].collect().toSet
    assert(out == Set("a"))
  }

  test("pps: equal weights draw exactly every stride-th unit") {
    // 10 units of weight 5, k=5 → W=50, stride=10: units 2,4,6,8,10
    val units = (1 to 10).map(i => ("s", i.toLong, 5L)).toDF("g", "u", "w")
    val out = PpsSample.draw(units, Seq("g"), "u", "w", k = 5)
      .select("u").as[Long].collect().sorted.toSeq
    assert(out == Seq(2L, 4L, 6L, 8L, 10L))
  }

  test("pps: an oversized unit gets multiplicity > 1") {
    // weights 1,1,1,97 with k=4 → stride 25: the giant spans 3..100,
    // crossing 25/50/75/100 → hits 4
    val units = Seq(("s", 1L, 1L), ("s", 2L, 1L), ("s", 3L, 1L),
      ("s", 4L, 97L)).toDF("g", "u", "w")
    val out = PpsSample.draw(units, Seq("g"), "u", "w", k = 4)
      .select(col("u"), col("hits")).as[(Long, Long)].collect().toMap
    assert(out(4L) == 4L)
    assert(!out.contains(1L) && !out.contains(2L) && !out.contains(3L))
  }

  test("gated instances: well-formed on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    assert(TrendTests.mannKendallEvents(spark, sf).collect().length == 5)
    assert(TrendTests.friedmanEvents(spark, sf).collect().length == 1)
    assert(Skyline.skylineCustomers(spark, sf).collect().nonEmpty)
    val pps = PpsSample.ppsCustomers(spark, sf).collect()
    assert(pps.nonEmpty)
    assert(pps.map(_.getAs[Long]("hits")).forall(_ >= 1L))
  }
}
