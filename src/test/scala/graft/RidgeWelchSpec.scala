package graft

import org.apache.spark.sql.functions._
import graft.ml.{LinReg, Ridge}
import graft.operators.WelchT

/** Hand-walked ground truth for the ridge path and pairwise Welch t². */
class RidgeWelchSpec extends SparkSpec {
  import spark.implicits._

  test("ridge: hand-solved 2x2 system at lambda = n, OLS row singular") {
    // y = 2·x1 over x1 ∈ {1,2,3}, x2 ≡ 0. With x2 dead the system is
    // block-diagonal: [[3,6],[6,14+λ]]·[b0,b1] = [12,28].
    // c=1 → λ=3: det'=15, b1 = 12/15 = 0.8, b0 = 36/15 = 2.4, b2 = 0.
    // c=0: the x2 block is singular (det = 0) → NULL coefficients.
    val df = Seq((1L, 0L, 2L), (2L, 0L, 4L), (3L, 0L, 6L))
      .toDF("x1", "x2", "y")
    val got = Ridge.ridgePath(df, col("y"), col("x1"), col("x2"),
        lambdaPerRow = Seq(0L, 1L), probeX1 = 30L, probeX2 = 5L)
      .orderBy("lambda_per_row")
      .select("lambda_per_row", "b0_micros", "b1_micros", "b2_micros",
        "yhat_probe_micros")
      .collect()
    assert(got.length === 2)
    val ols = got(0)
    assert(ols.getLong(0) === 0L)
    assert(ols.isNullAt(1) && ols.isNullAt(2) && ols.isNullAt(3))
    val r1 = got(1)
    assert(r1.getLong(1) === 2400000L, "b0")
    assert(r1.getLong(2) === 800000L, "b1")
    assert(r1.getLong(3) === 0L, "b2")
    assert(r1.getLong(4) === 2400000L + 30L * 800000L, "probe")
  }

  test("ridge: c=0 row reproduces the gated OLS fit bit-for-bit") {
    val li = Tables.lineitem(spark, sfDir)
    val ols = LinReg.fitTwoFeature(li,
      round(col("l_extendedprice")).cast("long"),
      round(col("l_quantity")).cast("long"),
      round(col("l_discount") * 100).cast("long"), 30L, 5L)
      .select("n", "b0_micros", "b1_micros", "b2_micros").head()
    val path0 = Ridge.ridgeLineitem(spark, sfDir)
      .filter(col("lambda_per_row") === 0)
      .select("n", "b0_micros", "b1_micros", "b2_micros").head()
    assert(ols === path0)
  }

  test("ridge: |b1| shrinks monotonically along the gated path") {
    val bs = Ridge.ridgeLineitem(spark, sfDir)
      .orderBy("lambda_per_row")
      .select("b1_micros").as[Long].collect()
    assert(bs.length === 4)
    assert(bs.map(math.abs).sliding(2).forall(p => p(0) >= p(1)),
      bs.mkString(","))
  }

  test("welch: hand case — t² = 24.2, sign split, staged micros") {
    // g1=[0,2]: n=2,S=2,Q=4,A=4 → v=2;  g2=[10,14]: n=2,S=24,Q=296,
    // A=16 → v=8. md = |1−12| = 11 → 11000 milli, sign −1 (g1 < g2).
    // t² = 11² / (2/2 + 8/2) = 24.2 → 24200000 micros.
    val df = Seq(("a", 0L), ("a", 2L), ("b", 10L), ("b", 14L))
      .toDF("g", "y")
    val got = WelchT.pairwise(df, col("g"), col("y"))
      .select("g1", "g2", "n1", "n2", "md_sign", "md_milli_abs",
        "t2_micros")
      .as[(String, String, Long, Long, Int, Long, Long)].head()
    assert(got === (("a", "b", 2L, 2L, -1, 11000L, 24200000L)))
  }

  test("welch: groups with n < 2 are excluded from pairing") {
    val df = Seq(("a", 1L), ("a", 3L), ("b", 5L), ("b", 9L), ("c", 7L))
      .toDF("g", "y")
    val pairs = WelchT.pairwise(df, col("g"), col("y"))
      .select("g1", "g2").as[(String, String)].collect().toSet
    assert(pairs === Set(("a", "b")))
  }

  test("welch: gated instance yields all three returnflag pairs") {
    val rows = WelchT.welchReturnflag(spark, sfDir)
      .select("g1", "g2").as[(String, String)].collect().toSet
    assert(rows === Set(("A", "N"), ("A", "R"), ("N", "R")))
  }
}
