package graft

import graft.operators.ExperimentDesign

/** Hand-walked ground truth for MDE sizing and the 2×2 DiD panel. */
class ExperimentDesignSpec extends SparkSpec {
  import spark.implicits._

  test("power MDE: unit-variance arm sizes to Z*sqrt(2/n) exactly") {
    // arm {0,2}: n=2, SS = 2·4 − 4 = 4, σ² = SS/n² = 1
    // MDE = Z·σ·√(2/n) = Z·1·1 → exactly the Z-sum in micros
    val got = ExperimentDesign.powerMde(
      Seq(("a", 0L), ("a", 2L)).toDF("arm", "v"), "arm", "v")
      .as[(String, Long, String, Long)].head()
    assert(got === (("a", 2L, "4", ExperimentDesign.ZSumPermicro)))
  }

  test("power MDE: quadrupling n halves the detectable effect") {
    // metric at realistic magnitude (σ = 10⁶) so the declared isqrt
    // truncation is parts-per-million, not the answer
    val small = Seq.fill(2)(Seq(0L, 2000000L)).flatten.map(("a", _))
    val big = Seq.fill(8)(Seq(0L, 2000000L)).flatten.map(("a", _))
    def mde(rows: Seq[(String, Long)]): Long =
      ExperimentDesign.powerMde(rows.toDF("arm", "v"), "arm", "v")
        .select("mde_micros").as[Long].head()
    val (m4, m16) = (mde(small), mde(big))
    assert(math.abs(m4 - 2 * m16) <= 10, s"m4=$m4 m16=$m16")
  }

  test("DiD: planted parallel-trends violation is recovered exactly") {
    val rows = Seq(
      (true, false, 10L), (true, true, 30L),
      (false, false, 10L), (false, true, 20L))
    val got = ExperimentDesign.diffInDiff(
      rows.toDF("treated", "post", "cents"), "treated", "post", "cents")
      .select("mean_t_pre_micros", "mean_t_post_micros",
        "mean_c_pre_micros", "mean_c_post_micros", "did_micros")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got === ((10000000L, 30000000L, 10000000L, 20000000L,
      10000000L)))
  }

  test("DiD: negative sums sign-split the truncating mean") {
    val rows = Seq(
      (true, false, -7L), (true, false, -8L), (true, true, 4L),
      (false, false, 0L), (false, true, 0L))
    val got = ExperimentDesign.diffInDiff(
      rows.toDF("treated", "post", "cents"), "treated", "post", "cents")
      .select("mean_t_pre_micros", "did_micros").as[(Long, Long)].head()
    // mean(-7,-8) = -(15e6 div 2) = -7500000
    assert(got._1 === -7500000L)
    assert(got._2 === (4000000L - -7500000L) - 0L)
  }
}
