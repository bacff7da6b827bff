package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{DriftMonitor, FileIngest, ThrottleStream, UpsertSink}
import graft.streaming.ThrottleStream.{Evt => TEvt}

/** End-to-end streaming medallion integration: CSV landing zone →
  * [[FileIngest]] bronze (lineage + checkpointed exactly-once drain) →
  * [[ThrottleStream]] silver (stateful first-per-bucket dedup) →
  * [[UpsertSink]] gold (versioned keyed dimension) with a
  * [[DriftMonitor]] watching the bronze feed — the reference's
  * spark_stream.py → merge_generator → monitoring topology as ONE
  * wired pipeline, including a full checkpoint restart across every
  * tier: new files drain incrementally, the throttle's (key, bucket)
  * state survives the restart, and the gold dimension versions forward
  * without reprocessing old rows.
  */
class MedallionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val eventSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("ts", TimestampType), StructField("event_id", LongType),
    StructField("value", DoubleType)))

  test("medallion pipeline: bronze→silver→gold with drift, surviving restart") {
    val root = Files.createTempDirectory("graft_medallion").toString
    val src = s"$root/src"; Files.createDirectories(Paths.get(src))
    val bronze = s"$root/bronze"
    val gold = s"$root/gold"

    // ---- landing: two CSV files, one in-bucket duplicate planted ----
    Files.write(Paths.get(s"$src/20240101_siteA.csv"),
      ("user_id,event_type,ts,event_id,value\n" +
        "1,click,2024-01-01 10:00:00,100,1.0\n" +
        "1,click,2024-01-01 10:20:00,101,2.0\n" + // same hour bucket: silver drops
        "2,view,2024-01-01 10:05:00,102,5.0\n").getBytes)
    Files.write(Paths.get(s"$src/20240101_siteB.csv"),
      ("user_id,event_type,ts,event_id,value\n" +
        "1,click,2024-01-01 11:10:00,103,3.0\n").getBytes) // next bucket: passes

    def drainBronze(): Unit = {
      val q = FileIngest.start(
        FileIngest.ingest(spark, src, eventSchema), bronze, s"$root/chk_bronze")
      q.awaitTermination(60000)
    }
    drainBronze()

    // bronze carries lineage and every landed row
    val b1 = spark.read.parquet(bronze)
    assert(b1.count() == 4)
    assert(b1.select("partitionName").distinct().as[String].collect().toSet ==
      Set("20240101"))

    // ---- silver + gold: one chained query (throttle → upsert sink) ----
    def silverGold() = UpsertSink.start(
      ThrottleStream.keepFirst(
        spark.readStream.schema(eventSchema).parquet(bronze).as[TEvt]).toDF(),
      gold, s"$root/chk_silver",
      naturalKey = Seq("user_id", "event_type"), orderCol = "event_id",
      compareCols = Seq("value"))

    // ---- drift monitor on the bronze value feed ----
    val baseline = (1 to 100).map(i => (i % 10) + 1.0).toDF("value")
    val reports = scala.collection.mutable.ArrayBuffer[Long]()
    def drift() = DriftMonitor.start(
      spark.readStream.schema(eventSchema).parquet(bronze).select("value"),
      baseline, "value", bins = 5, s"$root/chk_drift") { rep =>
      reports.synchronized { reports += rep.select("batch_id").head().getLong(0) }
    }

    val q1 = silverGold(); val d1 = drift()
    q1.processAllAvailable(); d1.processAllAvailable()
    q1.stop(); d1.stop()

    // the dim keeps business cols only (orderCol consumed by the merge);
    // values are unique per event here, so they identify the winner
    def goldState: Map[(Long, String), Double] =
      UpsertSink.currentState(spark, gold).get
        .select("user_id", "event_type", "value")
        .as[(Long, String, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap

    // event 101 throttled away; 103 (later bucket) superseded 100
    assert(goldState == Map(
      (1L, "click") -> 3.0,
      (2L, "view") -> 5.0), s"gold after first drain: $goldState")
    assert(reports.nonEmpty, "drift monitor emitted no report")
    val versionsAfterFirst = UpsertSink.versionHistory(gold).size

    // ---- restart: a third file lands with a cross-restart duplicate ----
    Files.write(Paths.get(s"$src/20240102_siteA.csv"),
      ("user_id,event_type,ts,event_id,value\n" +
        "1,click,2024-01-01 10:40:00,104,9.0\n" + // bucket 10:00 again: state must remember
        "3,click,2024-01-01 12:00:00,105,7.0\n").getBytes)
    drainBronze()
    assert(spark.read.parquet(bronze).count() == 6,
      "bronze restart reprocessed old files")

    val q2 = silverGold(); val d2 = drift()
    q2.processAllAvailable(); d2.processAllAvailable()
    q2.stop(); d2.stop()

    // the restored throttle state suppressed 104; 105 is a clean insert
    assert(goldState == Map(
      (1L, "click") -> 3.0,
      (2L, "view") -> 5.0,
      (3L, "click") -> 7.0), s"gold after restart: $goldState")
    assert(UpsertSink.versionHistory(gold).size > versionsAfterFirst,
      "gold dimension did not version forward")
    assert(reports.size >= 2, s"drift reports across restart: $reports")

    // CDC read over the retained gold history: the restart window's
    // change feed is exactly one insert (user 3), everything else
    // unchanged — the throttled duplicate never surfaces as a change
    val hist = UpsertSink.versionHistory(gold)
    val feed = UpsertSink.changesBetween(spark, gold,
        hist(versionsAfterFirst - 1).batchId, hist.last.batchId,
        naturalKey = Seq("user_id", "event_type"), compareCols = Seq("value"))
      .select("user_id", "event_type", "change_type")
      .as[(Long, String, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(feed == Map(
      (1L, "click") -> "unchanged",
      (2L, "view") -> "unchanged",
      (3L, "click") -> "insert"), s"restart change feed wrong: $feed")
  }
}
