package graft

import graft.operators.Kappa

/** Cohen's kappa: perfect agreement = 1, hand-computed mixed case,
  * constant rater scores exactly chance (κ=0), gated bounds. */
class KappaSpec extends SparkSpec {
  import spark.implicits._

  private def kap(rows: (String, String)*) =
    Kappa.cohensKappa(rows.toDF("a", "b"), "a", "b").collect().head

  test("perfect agreement is exactly kappa = 1e6") {
    val r = kap(("x", "x"), ("y", "y"), ("z", "z"), ("x", "x"))
    assert(r.getAs[Long]("kappa_permicro") === 1000000L)
    assert(r.getAs[Long]("po_permicro") === 1000000L)
  }

  test("hand-computed mixed case: kappa = 1/3") {
    // cells (x,x)=2 (x,y)=1 (y,x)=1 (y,y)=2: N=6 D=4 E=18
    val r = kap(("x", "x"), ("x", "x"), ("x", "y"), ("y", "x"),
      ("y", "y"), ("y", "y"))
    assert(r.getAs[Long]("po_permicro") === 666666L)
    assert(r.getAs[Long]("pe_permicro") === 500000L)
    assert(r.getAs[Long]("kappa_permicro") === 333333L) // (24-18)/(36-18)
  }

  test("constant rater at the marginal rate scores exactly chance") {
    val r = kap(("x", "x"), ("x", "x"), ("x", "x"),
      ("y", "x"), ("y", "x"), ("y", "x"))
    assert(r.getAs[Long]("kappa_permicro") === 0L)
  }

  test("systematic disagreement goes negative") {
    val r = kap(("x", "y"), ("y", "x"), ("x", "y"), ("y", "x"))
    assert(r.getAs[Long]("kappa_permicro") < 0L)
  }

  test("gated instance: one row, kappa within [-1e6, 1e6]") {
    val r = Kappa.kappaLangid(spark, sfDir).collect()
    assert(r.length === 1)
    val k = r.head.getAs[Long]("kappa_permicro")
    assert(k >= -1000000L && k <= 1000000L)
    assert(r.head.getAs[Long]("n") ===
      Tables.documents(spark, sfDir).count())
  }
}
