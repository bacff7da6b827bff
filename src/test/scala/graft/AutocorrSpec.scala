package graft

import org.apache.spark.sql.functions._
import graft.operators.Autocorr

class AutocorrSpec extends SparkSpec {
  import spark.implicits._

  private def series(xs: Seq[Long]) =
    xs.zipWithIndex.map { case (x, i) => ("s", i + 1, x) }
      .toDF("grp", "idx", "x")

  private def acfMap(xs: Seq[Long], maxLag: Int): Map[Int, Option[Long]] =
    Autocorr.acf(series(xs), "grp", "idx", "x", maxLag)
      .select($"lag", $"acf_permicro")
      .as[(Int, Option[Long])].collect().toMap

  test("alternating ±1 series: acf(k) = ∓(n-k)/n exactly") {
    val got = acfMap(Seq(1L, -1L, 1L, -1L, 1L, -1L), 2)
    assert(got(1) === Some(-833333L)) // -(5/6)
    assert(got(2) === Some(666666L))  //  (4/6)
  }

  test("linear trend 1..4: acf(1) = 1/4") {
    assert(acfMap(Seq(1L, 2L, 3L, 4L), 1)(1) === Some(250000L))
  }

  test("constant series has zero variance -> NULL acf") {
    assert(acfMap(Seq(5L, 5L, 5L, 5L), 1)(1) === None)
  }

  test("gated events instance: 5 types x 7 lags, |acf| <= 1") {
    val rows = Autocorr.acfEvents(spark, sfDir)
      .select($"event_type", $"lag", $"acf_permicro")
      .as[(String, Int, Option[Long])].collect()
    assert(rows.length === 35)
    assert(rows.forall { case (_, _, a) => a.forall(v => math.abs(v) <= 1000000L) })
  }
}
