package graft

import graft.operators.BrierDecomp

/** Murphy decomposition: perfect, inverted, and constant forecasts hit
  * their closed forms; gated instance pins the A/A shape. */
class BrierDecompSpec extends SparkSpec {
  import spark.implicits._

  private def dec(rows: (Double, Long)*) =
    BrierDecomp.decompose(rows.toDF("f", "y"), "f", "y").collect().head

  test("perfect forecast: REL = 0, Brier = 0") {
    val r = dec((0.0, 0L), (0.0, 0L), (1.0, 1L), (1.0, 1L))
    assert(r.getAs[Long]("rel_permicro") === 0L)
    assert(r.getAs[Long]("res_permicro") === 250000L)
    assert(r.getAs[Long]("unc_permicro") === 250000L)
    assert(r.getAs[Long]("brier_permicro") === 0L)
  }

  test("inverted forecast: full reliability penalty, Brier = 1") {
    val r = dec((1.0, 0L), (1.0, 0L), (0.0, 1L), (0.0, 1L))
    assert(r.getAs[Long]("rel_permicro") === 1000000L)
    assert(r.getAs[Long]("brier_permicro") === 1000000L)
  }

  test("constant 1/2 forecast on balanced labels: Brier = UNC = 1/4") {
    val r = dec((0.5, 0L), (0.5, 1L), (0.5, 0L), (0.5, 1L))
    assert(r.getAs[Long]("rel_permicro") === 0L)
    assert(r.getAs[Long]("res_permicro") === 0L)
    assert(r.getAs[Long]("brier_permicro") === 250000L)
  }

  test("gated instance: A/A label — resolution ~0, decomposition sane") {
    val r = BrierDecomp.brierEvents(spark, sfDir).collect().head
    assert(r.getAs[Long]("n") === Tables.events(spark, sfDir).count())
    val (rel, res, unc, b) = (r.getAs[Long]("rel_permicro"),
      r.getAs[Long]("res_permicro"), r.getAs[Long]("unc_permicro"),
      r.getAs[Long]("brier_permicro"))
    assert(res < 50000L)             // parity label carries no signal
    assert(unc > 200000L && unc <= 250000L)
    assert(rel > 0L)                 // uniform forecast vs a fair coin
    assert(b === unc - res + rel)
  }
}
