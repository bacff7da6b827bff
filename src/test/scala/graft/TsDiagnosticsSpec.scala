package graft

import graft.operators.TsDiagnostics
import org.apache.spark.sql.functions._

/** Planted-series contracts for the diagnostics battery: exact DW on a
  * symmetric alternating deviation (closed form 4(n−1)/n), runs-test
  * extremes (perfect alternation vs two blocks), Ljung-Box null on a
  * degenerate series and ordering between white-ish and ramp series. */
class TsDiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Seq[Long], grp: String = "g") =
    vals.zipWithIndex.map { case (v, i) => (grp, i + 1L, v) }
      .toDF("g", "idx", "v")

  test("durbin-watson: zero-covariance ±10 deviations give exactly DW = 2") {
    // deviation pattern −10,+10,+10,−10 per block of 4: Σs = Σi·s = 0,
    // so OLS is EXACTLY slope 100 / intercept 0 and residuals are the
    // pattern itself; diffs are ±20 at every even index →
    // num = (n/2)·400, den = n·100 → DW = 2 exactly
    val n = 20
    val pat = Seq(-10L, 10L, 10L, -10L)
    val vals = (1 to n).map(i => 100L * i + pat((i - 1) % 4))
    val out = TsDiagnostics.durbinWatson(series(vals), "g", "idx", "v")
      .collect()(0)
    assert(out.getAs[Long]("n_days") == n)
    assert(out.getAs[Long]("dw_permicro") == 2000000L)
  }

  test("durbin-watson: an exactly linear series has NULL dw") {
    val out = TsDiagnostics.durbinWatson(
      series((1 to 10).map(i => 7L * i + 3L)), "g", "idx", "v").collect()(0)
    assert(out.isNullAt(out.fieldIndex("dw_permicro")),
      "zero residual variance must not divide")
  }

  test("runs test: perfect alternation maximizes runs, blocks minimize") {
    // 1,100 repeated: every non-tie neighbor flips → runs = m
    val alt = TsDiagnostics.runsTest(
      series(Seq.fill(10)(Seq(1L, 100L)).flatten), "g", "idx", "v")
      .collect()(0)
    assert(alt.getAs[Long]("runs") == 20 && alt.getAs[Long]("n_pos") == 10
      && alt.getAs[Long]("n_neg") == 10)
    assert(alt.getAs[Long]("zsq_permicro") > 0, "too many runs → positive")
    // first half low, second half high → exactly 2 runs
    val blocks = TsDiagnostics.runsTest(
      series(Seq.fill(10)(1L) ++ Seq.fill(10)(100L)), "g", "idx", "v")
      .collect()(0)
    assert(blocks.getAs[Long]("runs") == 2)
    assert(blocks.getAs[Long]("zsq_permicro") < 0, "too few runs → negative")
  }

  test("runs test: median ties are excluded") {
    // values 1,2,3 ⇒ median 2; the 2s drop, leaving 1(-) and 3(+)
    val out = TsDiagnostics.runsTest(
      series(Seq(1L, 2L, 3L, 2L, 1L, 3L, 2L)), "g", "idx", "v").collect()(0)
    assert(out.getAs[Long]("n_pos") == 2 && out.getAs[Long]("n_neg") == 2)
  }

  test("ljung-box: degenerate series is NULL, ramp dwarfs alternation") {
    val const = TsDiagnostics.ljungBox(
      series(Seq.fill(30)(5L)), "g", "idx", "v", h = 7).collect()(0)
    assert(const.isNullAt(const.fieldIndex("q_permicro")),
      "zero-variance series has no defined ACF")
    val ramp = TsDiagnostics.ljungBox(
      series((1 to 40).map(_.toLong)), "g", "idx", "v", h = 7)
      .collect()(0).getAs[Long]("q_permicro")
    val shuffled = new scala.util.Random(42).shuffle((1 to 40).toList)
    val white = TsDiagnostics.ljungBox(
      series(shuffled.map(_.toLong)), "g", "idx", "v", h = 7)
      .collect()(0).getAs[Long]("q_permicro")
    assert(ramp > 10L * white,
      s"ramp Q ($ramp) must dwarf scrambled-series Q ($white)")
  }

  test("gated instances: one row per event type, DW in [0, 4e6]") {
    val sf = "/root/testdata/sf0.001"
    val dw = TsDiagnostics.durbinWatsonEvents(spark, sf).collect()
    assert(dw.length == 5)
    dw.foreach { r =>
      val v = r.getAs[Long]("dw_permicro")
      assert(v >= 0L && v <= 4000000L)
    }
    assert(TsDiagnostics.ljungBoxEvents(spark, sf).collect().length == 5)
    val rt = TsDiagnostics.runsTestEvents(spark, sf).collect()
    assert(rt.length == 5)
    rt.foreach(r => assert(r.getAs[Long]("runs") >= 1))
  }
}
