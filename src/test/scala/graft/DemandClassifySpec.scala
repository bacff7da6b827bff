package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.DemandClassify

/** The ADI/CV² quadrant must land each planted demand shape in its
  * textbook cell and report exact permicro statistics. */
class DemandClassifySpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")

  /** One event of `v` dollars on each listed day for `key`. */
  private def series(key: Long, demands: Seq[(Int, Double)]) =
    demands.map { case (d, v) => (key, ts(d), v) }

  test("each quadrant gets its textbook shape") {
    // 20-day window (driven by key 1 covering days 0 and 19).
    val rows =
      // smooth: demand EVERY day, constant size → ADI = 1, CV² = 0
      series(1L, (0 until 20).map(d => d -> 5.0)) ++
      // erratic: demand every day, wildly mixed sizes → ADI = 1, CV² big
      series(2L, (0 until 20).map(d => d -> (if (d % 2 == 0) 1.0 else 50.0))) ++
      // intermittent: every 4th day, constant size → ADI = 4, CV² = 0
      series(3L, (0 until 20 by 4).map(d => d -> 5.0)) ++
      // lumpy: every 4th day, wildly mixed sizes
      series(4L, (0 until 20 by 4).map(d => d -> (if (d % 8 == 0) 1.0 else 50.0)))
    val out = DemandClassify.classify(rows.toDF("user_id", "ts", "value"),
        "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5))).toMap
    assert(out(1L) == ((20L, 20L, 1000000L, 0L, "smooth")), s"${out(1L)}")
    val (n2, nz2, adi2, cv2b, c2) = out(2L)
    assert(n2 == 20L && nz2 == 20L && adi2 == 1000000L && c2 == "erratic")
    assert(cv2b >= 490000L, s"mixed sizes must cross the CV² cut: $cv2b")
    assert(out(3L)._5 == "intermittent" && out(3L)._3 == 4000000L &&
      out(3L)._4 == 0L, s"${out(3L)}")
    assert(out(4L)._5 == "lumpy" && out(4L)._3 == 4000000L &&
      out(4L)._4 >= 490000L, s"${out(4L)}")
  }

  test("exact CV² permicro on a hand case") {
    // sizes 100 and 300 cents: n=2, Σx=400, Σx²=100000 ⇒
    // CV² = (2·100000 − 160000)/160000 = 0.25 exactly
    val rows = series(1L, Seq(0 -> 1.0, 1 -> 3.0))
    val r = DemandClassify.classify(rows.toDF("user_id", "ts", "value"),
      "user_id", "ts", "value").collect().head
    assert(r.getLong(4) == 250000L, s"CV² must be exactly 0.25: $r")
  }

  test("signed demands use magnitudes — no zero-sum division") {
    // +5 and −5 dollars: signed Σ would be 0 (division by zero);
    // magnitudes give sizes {500, 500} ⇒ CV² = 0
    val rows = series(1L, Seq(0 -> 5.0, 1 -> -5.0))
    val r = DemandClassify.classify(rows.toDF("user_id", "ts", "value"),
      "user_id", "ts", "value").collect().head
    assert(r.getLong(4) == 0L && r.getLong(2) == 2L)
  }

  test("gated instance: every active user classified, permicros sane") {
    val out = DemandClassify.demandClassifyEvents(spark, sfDir)
      .localCheckpoint()
    assert(out.count() > 0)
    assert(out.filter(col("adi_permicro") < 1000000L).count() == 0,
      "ADI is ≥ 1 by construction (n_days ≥ n_nonzero)")
    assert(out.filter(col("cv2_permicro") < 0L).count() == 0,
      "population variance is nonnegative")
  }
}
