package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.{DedupStream, FileIngest, SessionizeState, WindowedAgg}
import graft.streaming.SessionizeState.Evt

/** Structured Streaming specs (#40–42): file ingestion with lineage,
  * watermarked windowed aggregation, stateful sessionization. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("file ingest: lineage columns + checkpointed sink, exactly-once drain") {
    val root = Files.createTempDirectory("graft_ingest").toString
    val src = s"$root/src"; Files.createDirectories(Paths.get(src))
    Files.write(Paths.get(s"$src/20231101_siteA.csv"),
      "user_id,value\n1,10.5\n2,20.0\n".getBytes)
    Files.write(Paths.get(s"$src/20231102_siteB.csv"),
      "user_id,value\n3,30.25\n".getBytes)
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("value", DoubleType)))

    val q = FileIngest.start(
      FileIngest.ingest(spark, src, schema),
      s"$root/out", s"$root/chk")
    q.awaitTermination(60000)

    val out = spark.read.parquet(s"$root/out")
      .select("user_id", "value", "sourceFile", "partitionName")
      .as[(Long, Double, String, String)].collect().sortBy(_._1)
    assert(out.length == 3)
    assert(out(0) == (1L, 10.5, "20231101_siteA.csv", "20231101"))
    assert(out(2) == (3L, 30.25, "20231102_siteB.csv", "20231102"))

    // restart on the same checkpoint: backlog already committed, no dupes
    val q2 = FileIngest.start(
      FileIngest.ingest(spark, src, schema), s"$root/out", s"$root/chk")
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$root/out").count() == 3)
  }

  test("evolving ingest: new source column lands after restart, old rows null-backfilled") {
    val root = Files.createTempDirectory("graft_evolve").toString
    val src = s"$root/src"; Files.createDirectories(Paths.get(src))
    Files.write(Paths.get(s"$src/20231101_siteA.csv"),
      "user_id,value\n1,10\n2,20\n".getBytes)

    // first run: two columns tracked at the schema location
    val q1 = FileIngest.start(
      FileIngest.ingestEvolving(spark, src, s"$root/schema"),
      s"$root/out", s"$root/chk")
    q1.awaitTermination(60000)

    // a new column appears (append-only, the autoloader contract);
    // restart evolves the tracked schema and resumes from the checkpoint
    Files.write(Paths.get(s"$src/20231102_siteB.csv"),
      "user_id,value,country\n3,30,DE\n".getBytes)
    val q2 = FileIngest.start(
      FileIngest.ingestEvolving(spark, src, s"$root/schema"),
      s"$root/out", s"$root/chk")
    q2.awaitTermination(60000)

    val out = spark.read.option("mergeSchema", "true").parquet(s"$root/out")
      .select("user_id", "value", "country", "sourceFile")
      .as[(String, String, Option[String], String)].collect().sortBy(_._1)
    assert(out.length == 3)
    assert(out(0) == ("1", "10", None, "20231101_siteA.csv"))   // pre-evolution
    assert(out(2) == ("3", "30", Some("DE"), "20231102_siteB.csv"))
    // exactly-once held across the schema change
    assert(spark.read.option("mergeSchema", "true").parquet(s"$root/out").count() == 3)
  }

  test("evolving ingest fails on a non-additive header instead of mis-assigning") {
    val root = Files.createTempDirectory("graft_evolve_bad").toString
    val src = s"$root/src"; Files.createDirectories(Paths.get(src))
    Files.write(Paths.get(s"$src/20231101_siteA.csv"),
      "user_id,value\n1,10\n".getBytes)
    FileIngest.ingestEvolving(spark, src, s"$root/schema")   // commits [user_id, value]

    // a column INSERTED mid-row: positional parse would put country values
    // into `value` — the stream must fail like autoloader, not mis-assign
    Files.write(Paths.get(s"$src/20231102_siteB.csv"),
      "user_id,country,value\n2,DE,20\n".getBytes)
    val ex = intercept[IllegalStateException] {
      FileIngest.ingestEvolving(spark, src, s"$root/schema")
    }
    assert(ex.getMessage.contains("20231102_siteB.csv"))
  }

  test("windowed agg finalizes windows once the watermark passes") {
    val in = MemoryStream[(Timestamp, String, Double)](spark)
    val agg = WindowedAgg.hourlyAgg(
      in.toDF().toDF("ts", "event_type", "value"),
      "ts", "event_type", "value", "1 hour", "2 hours")
    val q = agg.writeStream.format("memory").queryName("wagg")
      .outputMode("append").start()

    in.addData((ts("2024-01-01 10:05:00"), "click", 1.0),
               (ts("2024-01-01 10:55:00"), "click", 2.0),
               (ts("2024-01-01 11:10:00"), "view", 5.0))
    q.processAllAvailable()
    // watermark = 11:10 - 2h -> nothing finalized yet
    assert(spark.table("wagg").count() == 0)

    in.addData((ts("2024-01-01 13:30:00"), "view", 7.0))
    q.processAllAvailable()
    in.addData((ts("2024-01-01 14:30:00"), "view", 9.0))
    q.processAllAvailable()
    // watermark = 12:30: both the 10:00 and 11:00 windows are closed
    val rows = spark.table("wagg")
      .select("window_start", "event_type", "n_events", "total_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(rows == Set(
      (ts("2024-01-01 10:00:00"), "click", 2L, 3.0),
      (ts("2024-01-01 11:00:00"), "view", 1L, 5.0)))
    q.stop()
  }

  test("streaming dedup drops re-deliveries within the watermark") {
    val in = MemoryStream[(Long, Timestamp, Double)](spark)
    val q = DedupStream.dedup(
        in.toDF().toDF("event_id", "ts", "value"), "ts", "1 hour", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_s")
      .outputMode("append").start()

    in.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
               (2L, ts("2024-01-01 10:01:00"), 2.0),
               (1L, ts("2024-01-01 10:05:00"), 1.0)) // retry re-stamped: dup
    q.processAllAvailable()
    in.addData((1L, ts("2024-01-01 10:20:00"), 1.0), // still within horizon: dup
               (3L, ts("2024-01-01 10:21:00"), 3.0))
    q.processAllAvailable()
    val ids = spark.table("dedup_s").select("event_id")
      .as[Long].collect().toList
    assert(ids.sorted == List(1L, 2L, 3L), s"got $ids")
    q.stop()
  }

  test("stateful sessionization: gap close in-batch and timeout close") {
    val in = MemoryStream[Evt](spark)
    val q = SessionizeState.sessions(in.toDS())
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()

    in.addData(
      Evt(1L, ts("2024-01-01 10:00:00"), 1.0),
      Evt(1L, ts("2024-01-01 10:10:00"), 2.0),
      Evt(1L, ts("2024-01-01 12:00:00"), 4.0), // >30min gap: closes session A
      Evt(2L, ts("2024-01-01 10:05:00"), 9.0))
    q.processAllAvailable()
    // user1's first session closes by gap; user2's closes by timeout in the
    // no-data batch that follows the watermark advance to 11:00
    val afterB1 = spark.table("sess")
      .as[SessionizeState.Session].collect().toSet
    assert(afterB1.map(s => (s.user_id, s.session_start, s.n_events, s.total_value)) ==
      Set((1L, ts("2024-01-01 10:00:00"), 2, 3.0),
          (2L, ts("2024-01-01 10:05:00"), 1, 9.0)))

    // push the watermark past user1's 12:00+30min timeout (wm = max - 1h)
    in.addData(Evt(3L, ts("2024-01-01 14:00:00"), 1.0))
    q.processAllAvailable()
    in.addData(Evt(3L, ts("2024-01-01 14:01:00"), 1.0))
    q.processAllAvailable()

    val all = spark.table("sess").as[SessionizeState.Session].collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.total_value)).toSet
    assert(all.contains((1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:00:00"), 1, 4.0)),
      s"timed-out open session not emitted: $all")
    assert(all.contains((2L, ts("2024-01-01 10:05:00"), ts("2024-01-01 10:05:00"), 1, 9.0)),
      s"user2 session not emitted: $all")
    q.stop()
  }

  test("streaming throttle: one event per (key, hour bucket) across micro-batches") {
    import graft.streaming.ThrottleStream
    import ThrottleStream.{Evt => TEvt}
    val in = MemoryStream[TEvt](spark)
    val q = ThrottleStream.keepFirst(in.toDS())
      .writeStream.format("memory").queryName("throttled")
      .outputMode("append").start()

    in.addData(
      TEvt(1L, "click", ts("2024-01-01 10:00:00"), 100L, 1.0),
      TEvt(1L, "click", ts("2024-01-01 10:20:00"), 101L, 1.0), // same bucket: dropped
      TEvt(1L, "view",  ts("2024-01-01 10:25:00"), 102L, 1.0), // other type: passes
      TEvt(2L, "click", ts("2024-01-01 10:30:00"), 103L, 1.0))
    q.processAllAvailable()
    def ids = spark.table("throttled").as[TEvt].collect().map(_.event_id).toSet
    assert(ids == Set(100L, 102L, 103L))

    // NEXT micro-batch, same bucket: state must persist the dedup
    in.addData(TEvt(1L, "click", ts("2024-01-01 10:40:00"), 104L, 1.0))
    q.processAllAvailable()
    assert(ids == Set(100L, 102L, 103L), "cross-batch duplicate admitted")

    // a later bucket admits again
    in.addData(TEvt(1L, "click", ts("2024-01-01 11:05:00"), 105L, 1.0))
    q.processAllAvailable()
    assert(ids == Set(100L, 102L, 103L, 105L))
    q.stop()
  }

  test("streaming throttle: old-but-within-watermark buckets cannot re-admit") {
    // regression (round-11 ADVICE): with keepBuckets·bucketMs smaller
    // than the watermark delay, the old horizon-based pruning dropped an
    // admitted bucket from state while the watermark still let events
    // into it — every such event re-admitted. Pruning now follows the
    // watermark, so the bucket stays until no event can reach it.
    import graft.streaming.ThrottleStream
    import ThrottleStream.{Evt => TEvt}
    val in = MemoryStream[TEvt](spark)
    val q = ThrottleStream.keepFirst(in.toDS(),
        bucketMs = 60 * 1000L, keepBuckets = 1, watermark = "1 hour")
      .writeStream.format("memory").queryName("throttled_wm")
      .outputMode("append").start()
    in.addData(
      TEvt(1L, "click", ts("2024-01-01 10:00:10"), 300L, 1.0), // bucket 10:00
      TEvt(1L, "click", ts("2024-01-01 10:05:10"), 301L, 1.0)) // bucket 10:05
    q.processAllAvailable()
    // next batch: bucket 10:00 again — older than newest−keepBuckets but
    // comfortably within the 1h watermark. Must stay suppressed.
    in.addData(TEvt(1L, "click", ts("2024-01-01 10:00:40"), 302L, 1.0))
    q.processAllAvailable()
    val ids = spark.table("throttled_wm").as[TEvt].collect().map(_.event_id).toSet
    assert(ids == Set(300L, 301L), s"watermark-reachable bucket re-admitted: $ids")
    q.stop()
  }

  test("streaming throttle: same-batch events in a watermark-passed bucket admit once") {
    // direct state-function test (TestGroupState): Spark 4.x late-filters
    // with the PREVIOUS batch's watermark (SPARK-40925), so a batch can
    // carry several events for a bucket the EVICTION watermark already
    // passed. In-loop pruning dropped the bucket between those events,
    // admitting each one; the single post-batch prune must not.
    import graft.streaming.ThrottleStream
    import ThrottleStream.{Evt => TEvt, Seen}
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val wm = ts("2024-01-01 10:30:00").getTime
    val st = TestGroupState.create[Seen](org.apache.spark.api.java.Optional.empty[Seen](),
      GroupStateTimeout.EventTimeTimeout(), 0L,
      org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(wm)), hasTimedOut = false)
    val out = ThrottleStream.updateState(60 * 1000L, 1)(
      (1L, "click"), Iterator(
        TEvt(1L, "click", ts("2024-01-01 11:35:10"), 1L, 1.0),
        TEvt(1L, "click", ts("2024-01-01 09:30:40"), 2L, 1.0), // old bucket
        TEvt(1L, "click", ts("2024-01-01 09:30:50"), 3L, 1.0)), // same old bucket
      st).toSeq
    assert(out.map(_.event_id) == Seq(1L, 2L),
      s"second same-bucket event re-admitted: ${out.map(_.event_id)}")
    // post-batch prune drops the watermark-passed bucket, keeps the live one
    val buckets = st.get.buckets
    assert(buckets == Set(ts("2024-01-01 11:35:00").getTime / 60000),
      s"stale bucket retained or live bucket lost: $buckets")
  }

  test("streaming throttle: timeout timestamp clamps above the watermark") {
    // a batch whose only events land in already-seen old buckets leaves
    // newestBucket+keepBuckets behind the eviction watermark; an
    // un-clamped setTimeoutTimestamp would throw and kill the query
    import graft.streaming.ThrottleStream
    import ThrottleStream.{Evt => TEvt, Seen}
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val oldBucket = ts("2024-01-01 09:30:00").getTime / 60000
    val wm = ts("2024-01-01 10:30:00").getTime
    val st = TestGroupState.create[Seen](
      org.apache.spark.api.java.Optional.of(Seen(oldBucket, Set(oldBucket))),
      GroupStateTimeout.EventTimeTimeout(), 0L,
      org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(wm)), hasTimedOut = false)
    val out = ThrottleStream.updateState(60 * 1000L, 1)(
      (1L, "click"),
      Iterator(TEvt(1L, "click", ts("2024-01-01 09:30:40"), 9L, 1.0)),
      st).toSeq
    assert(out.isEmpty, "suppressed event emitted")
    assert(st.getTimeoutTimestampMs.get() > wm,
      "timeout timestamp must clamp above the current watermark")
  }

  test("streaming throttle: dedup state survives a checkpointed restart") {
    import graft.streaming.ThrottleStream
    import ThrottleStream.{Evt => TEvt}
    val root = java.nio.file.Files.createTempDirectory("graft_thr_restart").toString
    val in = MemoryStream[TEvt](spark)
    // memory sink cannot recover a checkpoint; the file sink can
    def run() = ThrottleStream.keepFirst(in.toDS())
      .writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/chk")
      .outputMode("append").start()

    val q1 = run()
    in.addData(TEvt(1L, "click", ts("2024-01-01 10:00:00"), 200L, 1.0))
    q1.processAllAvailable()
    q1.stop()

    // restart from the checkpoint: the (key, bucket) state must be
    // restored, so the same bucket still rejects
    val q2 = run()
    in.addData(TEvt(1L, "click", ts("2024-01-01 10:30:00"), 201L, 1.0))
    q2.processAllAvailable()
    val ids = spark.read.parquet(s"$root/out")
      .as[TEvt].collect().map(_.event_id).toSet
    assert(ids == Set(200L), s"restart lost throttle state: $ids")
    q2.stop()
  }

  test("drift monitor: matching batch scores near zero, shifted batch scores high") {
    import graft.streaming.DriftMonitor
    val baseline = (1 to 200).map(i => (i % 100) / 100.0).toDF("v")
    val reports = scala.collection.mutable.Map[Long, Long]()
    val in = MemoryStream[Double](spark)
    val chk = java.nio.file.Files.createTempDirectory("graft_drift_chk").toString
    val q = DriftMonitor.start(in.toDF().toDF("v"), baseline, "v",
        bins = 10, chk) { rep =>
      val id = rep.select("batch_id").head().getLong(0)
      reports.synchronized {
        reports(id) = rep.agg(sum(abs(col("psi_micros")))).head().getLong(0)
      }
    }
    in.addData((1 to 200).map(i => (i % 100) / 100.0): _*) // same distribution
    q.processAllAvailable()
    in.addData((1 to 200).map(i => 0.9 + (i % 10) / 100.0): _*) // shifted mass
    q.processAllAvailable()
    q.stop()
    assert(reports.size == 2, s"expected two reports: $reports")
    val Seq(same, shifted) = reports.toSeq.sortBy(_._1).map(_._2)
    assert(same < 50000L, s"A/A batch drifted: $same micros")
    assert(shifted > 500000L, s"shifted batch not flagged: $shifted micros")
    assert(shifted > 10 * same, s"no separation: $reports")
  }
}
