package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.ForecastMonitor

/** The forecast monitor must score arriving actuals against persisted
  * predictions with exact integer errors, drop out-of-horizon days,
  * and emit one self-contained report per micro-batch. */
class ForecastMonitorSpec extends SparkSpec {
  import spark.implicits._

  private val cutoff = Date.valueOf("2024-01-10")
  private def ts(day: String, h: Int = 12): Timestamp =
    Timestamp.valueOf(s"2024-01-$day $h:00:00")

  /** ŷ(k) = 1000·k cents for user 1, k = 1..3. */
  private def preds = Seq(
    (1L, 1, 1000L), (1L, 2, 2000L), (1L, 3, 3000L)
  ).toDF("user_id", "k", "yhat_cents")

  test("score: exact errors, horizon filter, daily aggregation") {
    val batch = Seq(
      (1L, ts("11"), 7.0),  // day k=1: two events summing 1250 cents
      (1L, ts("11", 18), 5.5),
      (1L, ts("12"), 15.0), // k=2: 1500 vs 2000 → err −500
      (1L, ts("20"), 9.0),  // k=10: outside horizon → dropped
      (2L, ts("11"), 3.0)   // unknown series → dropped
    ).toDF("user_id", "ts", "value")
    val out = ForecastMonitor.score(batch, preds, cutoff,
        "user_id", "ts", "value")
      .collect().map(r => r.getInt(2) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out.size == 2, s"only in-horizon known-series days: $out")
    assert(out(1) == ((1250L, 1000L, 250L, 250L)))
    assert(out(2) == ((1500L, 2000L, -500L, 500L)))
  }

  test("streaming: per-batch self-contained reports over MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp, Double)]
    val stream = ms.toDF.toDF("user_id", "ts", "value")
    val reports = scala.collection.mutable.ArrayBuffer[(Long, Int, Long)]()
    val chk = Files.createTempDirectory("fmon").toString
    val q = ForecastMonitor.start(stream, preds, cutoff,
        "user_id", "ts", "value", chk) { rep =>
      reports.synchronized {
        reports ++= rep.collect().map(r =>
          (r.getAs[Long]("batch_id"), r.getAs[Int]("k"),
            r.getAs[Long]("abs_err_cents")))
      }
    }
    ms.addData((1L, ts("11"), 12.5))        // k=1: 1250 vs 1000 → 250
    q.processAllAvailable()
    ms.addData((1L, ts("13"), 29.0))        // k=3: 2900 vs 3000 → 100
    q.processAllAvailable()
    q.stop()
    val got = reports.synchronized(reports.toList).sortBy(_._2)
    assert(got.map(t => (t._2, t._3)) == List((1, 250L), (3, 100L)),
      s"got $got")
    // reports carry distinct batch ids — self-contained per epoch
    assert(got.map(_._1).distinct.size == 2)
  }
}
