package graft

import org.apache.spark.sql.functions._
import graft.functions.ThetaSketch

/** KMV/Theta sketch invariants: exactness below saturation, estimate
  * accuracy within the k-driven bound above it, and correct set
  * algebra on planted overlaps. */
class ThetaSketchSpec extends SparkSpec {
  import spark.implicits._

  test("below saturation the sketch is exact, including the intersection") {
    val a = (1L to 40L).toDF("k")
    val b = (31L to 60L).toDF("k") // |A∩B| = 10, |A∪B| = 60
    val r = ThetaSketch.setEstimates(a, "k", b, "k").collect().head
    assert(r.getAs[Long]("n_a") === 40L && r.getAs[Long]("est_a") === 40L)
    assert(r.getAs[Long]("n_b") === 30L && r.getAs[Long]("est_b") === 30L)
    assert(r.getAs[Long]("est_union") === 60L)
    assert(r.getAs[Long]("n_common_retained") === 10L)
    assert(r.getAs[Long]("est_intersect") === 10L)
  }

  test("saturated estimates land within 4/sqrt(k) of truth") {
    val a = (1L to 3000L).toDF("k")
    val b = (2001L to 5000L).toDF("k") // overlap 1000, union 5000
    val r = ThetaSketch.setEstimates(a, "k", b, "k").collect().head
    val tol = 4.0 / math.sqrt(ThetaSketch.K)
    def within(est: Long, truth: Long) =
      math.abs(est - truth) <= truth * tol
    assert(within(r.getAs[Long]("est_a"), 3000L), s"est_a=${r.getAs[Long]("est_a")}")
    assert(within(r.getAs[Long]("est_b"), 3000L), s"est_b=${r.getAs[Long]("est_b")}")
    assert(within(r.getAs[Long]("est_union"), 5000L),
      s"est_union=${r.getAs[Long]("est_union")}")
    // intersection is the noisiest (variance over the overlap fraction):
    // assert the order of magnitude, not the tight bound
    val ei = r.getAs[Long]("est_intersect")
    assert(ei > 0L && ei < 3000L, s"est_intersect=$ei")
  }

  test("disjoint saturated sets estimate an empty intersection") {
    val a = (1L to 2000L).toDF("k")
    val b = (100001L to 102000L).toDF("k")
    val r = ThetaSketch.setEstimates(a, "k", b, "k").collect().head
    // retained-match probability ~ k²/min(n) — tiny; exact 0 expected
    assert(r.getAs[Long]("n_common_retained") === 0L)
    assert(r.getAs[Long]("est_intersect") === 0L)
  }

  test("identical sets: union estimate equals the set estimate exactly") {
    val a = (1L to 4000L).toDF("k")
    val r = ThetaSketch.setEstimates(a, "k", a, "k").collect().head
    assert(r.getAs[Long]("est_a") === r.getAs[Long]("est_b"))
    assert(r.getAs[Long]("est_union") === r.getAs[Long]("est_a"))
    // the kth hash IS θ and the retained-match rule is strictly h < θ
    // (the canonical Theta convention matching est = (k−1)/θ): k−1
    assert(r.getAs[Long]("n_common_retained") === (ThetaSketch.K - 1).toLong)
    assert(r.getAs[Long]("est_intersect") === r.getAs[Long]("est_a"))
  }

  test("empty set: zero estimates, intersection empty") {
    val a = (1L to 100L).toDF("k")
    val b = a.filter(col("k") < 0)
    val r = ThetaSketch.setEstimates(a, "k", b, "k").collect().head
    assert(r.getAs[Long]("n_b") === 0L && r.getAs[Long]("est_b") === 0L)
    assert(r.getAs[Long]("est_intersect") === 0L)
    assert(r.getAs[Long]("est_union") === r.getAs[Long]("est_a"))
  }

  test("gated instance returns one row at sf0.001") {
    val r = ThetaSketch.thetaCustomers(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_a") > 0L)
    assert(r.getAs[Long]("est_union") >= r.getAs[Long]("est_a"))
  }
}
