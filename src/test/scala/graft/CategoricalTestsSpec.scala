package graft

import graft.operators.{LeveneTest, PairedTests}

/** Planted-ground-truth checks for Brown–Forsythe, McNemar, and
  * Cochran–Armitage: hand-computed statistics on tiny frames, exact
  * median doubling on even groups, and degenerate-input guards. */
class CategoricalTestsSpec extends SparkSpec {
  import spark.implicits._

  test("brown-forsythe: equal groups give zero SSB; f_ppm 0") {
    val vals = Seq(0L, 1L, 3L, 4L) // 2·med = 4; z = {4,2,2,4}
    val df = (vals.map(("a", _)) ++ vals.map(("b", _))).toDF("g", "v")
    val r = LeveneTest.brownForsythe(df, "g", "v").collect().head
    // identical multisets → zbars equal → SSB 0; per group
    // ssw = 2(4000−3000)² + 2(2000−3000)² = 4e6 milli²
    assert(r.getAs[Long]("n") === 8L)
    assert(r.getAs[String]("ssb_milli2") === "0")
    assert(r.getAs[String]("ssw_milli2") === "8000000")
    assert(r.getAs[Long]("f_ppm") === 0L)
  }

  test("brown-forsythe: hand-computed F on unequal dispersion") {
    // g=a: {10,10,10,10} z=0 all; g=b: {0,20,0,20} 2·med=20, z=20 all
    // zbar_a=0, zbar_b=20000 milli, zbar=10000; ssb=4·1e8+4·1e8=8e8
    // ssw=0 → f NULL (guarded)
    val df = (Seq.fill(4)(("a", 10L)) ++
      Seq(("b", 0L), ("b", 20L), ("b", 0L), ("b", 20L))).toDF("g", "v")
    val r = LeveneTest.brownForsythe(df, "g", "v").collect().head
    assert(r.getAs[String]("ssb_milli2") === "800000000")
    assert(r.getAs[String]("ssw_milli2") === "0")
    assert(r.isNullAt(r.fieldIndex("f_ppm")))
  }

  test("brown-forsythe: even-count median is the exact doubled midpoint") {
    // g: {1,2,9,10} → 2·med = 2+9 = 11; z = {9,7,7,9}
    val df = Seq(("g", 1L), ("g", 2L), ("g", 9L), ("g", 10L),
      ("h", 5L), ("h", 5L)).toDF("g", "v")
    val r = LeveneTest.brownForsythe(df, "g", "v").collect().head
    // zbar_g = 8000 milli; ssw_g = 2·(9000−8000)²+2·(7000−8000)² = 4e6
    assert(r.getAs[String]("ssw_milli2") === "4000000")
  }

  test("mcnemar: hand-computed cells and continuity-corrected chi2") {
    // n01=4, n10=1 → chi2 = (|4−1|−1)²/5 = 4/5 → 800000 ppm
    val df = (Seq.fill(3)((false, false)) ++ Seq.fill(4)((false, true)) ++
      Seq((true, false)) ++ Seq.fill(2)((true, true))).toDF("a", "b")
    val r = PairedTests.mcnemar(df, "a", "b").collect().head
    assert((r.getAs[Long]("n00"), r.getAs[Long]("n01"),
      r.getAs[Long]("n10"), r.getAs[Long]("n11")) === ((3L, 4L, 1L, 2L)))
    assert(r.getAs[Long]("chi2_cc_ppm") === 800000L)
  }

  test("mcnemar: no discordant pairs yields NULL chi2") {
    val df = Seq((true, true), (false, false)).toDF("a", "b")
    val r = PairedTests.mcnemar(df, "a", "b").collect().head
    assert(r.isNullAt(r.fieldIndex("chi2_cc_ppm")))
  }

  test("cochran-armitage: perfect trend has positive z2, flat trend zero T") {
    // doses 1..3, hit rate rises 0%, 50%, 100% (2 units each)
    val up = Seq((1L, false), (1L, false), (2L, false), (2L, true),
      (3L, true), (3L, true)).toDF("dose", "hit")
    val r1 = PairedTests.cochranArmitage(up, "dose", "hit").collect().head
    assert(r1.getAs[Long]("n") === 6L && r1.getAs[Long]("r") === 3L)
    // T = 10⁶·Σwr − p̄·Σwn = 10⁶·8 − 500000·12 = 2·10⁶
    assert(r1.getAs[String]("t_scaled") === "2000000")
    assert(r1.getAs[Long]("z2_ppm") > 0L)
    // flat: every dose 50% → T = 0
    val flat = Seq((1L, false), (1L, true), (2L, false), (2L, true))
      .toDF("dose", "hit")
    val r2 = PairedTests.cochranArmitage(flat, "dose", "hit").collect().head
    assert(r2.getAs[String]("t_scaled") === "0")
    assert(r2.getAs[Long]("z2_ppm") === 0L)
  }

  test("cochran-armitage: single dose or degenerate rate yields NULL z2") {
    val one = Seq((2L, true), (2L, false)).toDF("dose", "hit")
    val r = PairedTests.cochranArmitage(one, "dose", "hit").collect().head
    assert(r.isNullAt(r.fieldIndex("z2_ppm"))) // N·Σw²n = (Σwn)² → V=0
    val allHit = Seq((1L, true), (2L, true)).toDF("dose", "hit")
    val r2 = PairedTests.cochranArmitage(allHit, "dose", "hit").collect().head
    assert(r2.isNullAt(r2.fieldIndex("z2_ppm"))) // p̄ = 1 → V=0
  }

  test("gated instances return one row at sf0.001") {
    assert(LeveneTest.leveneLineitem(spark, sfDir).count() === 1)
    assert(PairedTests.mcnemarCustomers(spark, sfDir).count() === 1)
    assert(PairedTests.trendPriority(spark, sfDir).count() === 1)
  }
}
