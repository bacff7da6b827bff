package graft

import org.apache.spark.sql.functions._
import graft.functions.ZipfFit

/** Zipf fit: a two-point exact-power corpus recovers slope -1 and the
  * ln(c) intercept bit-exactly; gated slope is negative. */
class ZipfFitSpec extends SparkSpec {
  import spark.implicits._

  test("two-point 1/rank corpus: slope exactly -1e6, intercept ln(4)") {
    // a×4 (rank 1), b×2 (rank 2): y = ln 4 - 1·x through both points
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b")).toDF("w")
    val r = ZipfFit.fit(df, "w", topK = 10).collect().head
    assert(r.getAs[Long]("n_points") === 2L)
    assert(r.getAs[Long]("slope_permicro") === -1000000L)
    assert(r.getAs[Long]("intercept_permicro") === 1386294L)
  }

  test("uniform frequencies: slope exactly 0") {
    val df = Seq("a", "b", "c", "d").toDF("w")
    val r = ZipfFit.fit(df, "w", topK = 10).collect().head
    assert(r.getAs[Long]("slope_permicro") === 0L)
  }

  test("topK caps the point set deterministically") {
    val df = (1 to 20).flatMap(i => Seq.fill(21 - i)(s"t$i")).toDF("w")
    val r = ZipfFit.fit(df, "w", topK = 5).collect().head
    assert(r.getAs[Long]("n_points") === 5L)
  }

  test("gated instance: corpus rank-frequency slope is negative") {
    val r = ZipfFit.zipfDocuments(spark, sfDir).collect().head
    // the synthetic corpus has a small closed vocabulary (~31 types at
    // sf0.001) — the fit is still well-posed and downward-sloping
    assert(r.getAs[Long]("n_points") > 10L)
    assert(r.getAs[Long]("slope_permicro") < 0L)
  }
}
