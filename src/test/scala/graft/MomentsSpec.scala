package graft

import graft.operators.Moments

/** Hand-walked ground truth for the pivot-centered moment profile. */
class MomentsSpec extends SparkSpec {
  import spark.implicits._

  test("symmetric values: skew exactly 0, kurtosis at the declared floor") {
    // {0,10,20}: m0=10, y=(-10,0,10) -> S2=200 S3=0 S4=20000
    // v2 = 66, v4 = 6666 -> kurt = (1e6*6666)//(66*66) = 1530302
    val got = Moments.skewKurtosis(
      Seq(("s", 0L), ("s", 10L), ("s", 20L)).toDF("g", "x"), "g", "x")
      .select("n", "m0", "v2", "skew_permicro", "kurt_permicro")
      .as[(Long, Long, String, Long, Long)].head()
    assert(got === ((3L, 10L, "66", 0L, 6666000000L / 4356L)))
  }

  test("right-skewed values: positive skew, hand-walked permicro") {
    // {0,0,30}: m0=10, y=(-10,-10,20) -> S2=600 S3=6000 S4=180000
    // v2=200 v3=2000 v4=60000; isqrt(200)=14
    // skew = 2e9 // 2800 = 714285 ; kurt = 6e10 // 4e4 = 1500000
    val got = Moments.skewKurtosis(
      Seq(("r", 0L), ("r", 0L), ("r", 30L)).toDF("g", "x"), "g", "x")
      .select("v2", "skew_permicro", "kurt_permicro")
      .as[(String, Long, Long)].head()
    assert(got === (("200", 714285L, 1500000L)))
  }

  test("mirrored values flip the skew sign exactly") {
    def skew(xs: Seq[Long]): Long = Moments.skewKurtosis(
      xs.map(("m", _)).toDF("g", "x"), "g", "x")
      .select("skew_permicro").as[Long].head()
    // sums divisible by n on BOTH sides so the floor pivot is the
    // exact mean and mirroring is exact (the declared contract only
    // guarantees sign-flip when the pivots mirror)
    val xs = Seq(0L, 0L, 5L, 35L)
    assert(skew(xs) === -skew(xs.map(35L - _)))
  }

  test("constant group: variance 0 reports NULL shape, not a crash") {
    val got = Moments.skewKurtosis(
      Seq(("c", 7L), ("c", 7L)).toDF("g", "x"), "g", "x")
      .select("v2", "skew_permicro", "kurt_permicro")
      .as[(String, Option[Long], Option[Long])].head()
    assert(got === (("0", None, None)))
  }
}
