package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.BinSeg

/** BinSeg must find a planted level shift exactly, prefer the larger
  * of two shifts, and break equal-gain ties to the earliest day. */
class BinSegSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")

  /** `counts(d)` events on day d (one row per event). */
  private def series(key: String, counts: Seq[Int]) =
    counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)((key, ts(d), 1.0))
    }

  test("a clean level shift is cut exactly at the boundary") {
    // 10 days at 2/day then 10 days at 8/day: the best SSE cut is k=10
    val df = series("a", Seq.fill(10)(2) ++ Seq.fill(10)(8))
      .toDF("event_type", "ts", "value")
    val r = BinSeg.binsegDailyCounts(df, "event_type", "ts", "value")
      .collect().head
    assert(r.getAs[Long]("cut_k") == 10L, s"cut must land on the shift: $r")
    assert(r.getAs[Long]("n_days") == 20L)
    assert(r.getAs[Long]("mean_before_micros") == 2000000L)
    assert(r.getAs[Long]("mean_after_micros") == 8000000L)
  }

  test("the larger of two shifts wins") {
    // small step at day 5 (2→3), big step at day 15 (3→9)
    val df = series("a",
      Seq.fill(5)(2) ++ Seq.fill(10)(3) ++ Seq.fill(10)(9))
      .toDF("event_type", "ts", "value")
    val r = BinSeg.binsegDailyCounts(df, "event_type", "ts", "value")
      .collect().head
    assert(r.getAs[Long]("cut_k") == 15L,
      s"the dominant shift is at k=15: $r")
  }

  test("constant series: all gains zero, tie broken to the earliest day") {
    val df = series("a", Seq.fill(8)(4)).toDF("event_type", "ts", "value")
    val r = BinSeg.binsegDailyCounts(df, "event_type", "ts", "value")
      .collect().head
    assert(r.getAs[Long]("gain_q") == 0L)
    assert(r.getAs[Long]("cut_k") == 1L, "zero-gain ties go earliest")
  }

  test("gated instance covers every event type with valid side means") {
    val out = BinSeg.binsegEvents(spark, sfDir).localCheckpoint()
    assert(out.count() ==
      Tables.events(spark, sfDir).select("event_type").distinct().count())
    assert(out.filter(col("cut_k") < 1 || col("cut_k") >= col("n_days"))
      .count() == 0)
  }
}
