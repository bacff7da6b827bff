package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamJoins

/** Specs for the two streaming join shapes: stream⋈static dim enrichment
  * (stateless, per micro-batch) and event-time-bounded stream-stream
  * inner join (state evicted past the watermark). */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("enrichWithDim: every micro-batch joins the dim snapshot, unmatched keys null") {
    val dim = Seq((1L, "alice", "US"), (2L, "bob", "DE"))
      .toDF("user_id", "name", "country")
    val in = MemoryStream[(Long, Double)](spark)
    val enriched = StreamJoins.enrichWithDim(
      in.toDF().toDF("user_id", "value"), dim, "user_id", "user_id")
    val q = enriched.writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()

    in.addData((1L, 10.0), (3L, 30.0))
    q.processAllAvailable()
    val b1 = spark.table("enrich")
      .select("user_id", "value", "dim_name", "dim_country")
      .as[(Long, Double, Option[String], Option[String])].collect().sortBy(_._1)
    assert(b1.toList == List(
      (1L, 10.0, Some("alice"), Some("US")),
      (3L, 30.0, None, None)))   // left join: stream rows survive a dim miss

    // second micro-batch joins the same snapshot independently
    in.addData((2L, 20.0))
    q.processAllAvailable()
    val all = spark.table("enrich")
      .select("user_id", "dim_name").as[(Long, Option[String])].collect().toSet
    assert(all == Set((1L, Some("alice")), (3L, None), (2L, Some("bob"))))
    q.stop()
  }

  test("joinWithin: in-window match emitted, out-of-window and post-eviction rows dropped") {
    val left = MemoryStream[(Long, Timestamp, String)](spark)
    val right = MemoryStream[(Long, Timestamp, String)](spark)
    val joined = StreamJoins.joinWithin(
      left.toDF().toDF("k", "lts", "l_tag"),
      right.toDF().toDF("rk", "rts", "r_tag"),
      "k", "rk", "lts", "rts", watermark = "10 minutes", within = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("swithin")
      .outputMode("append").start()

    left.addData((1L, ts("2024-01-01 10:00:00"), "L1"))
    right.addData(
      (1L, ts("2024-01-01 10:03:00"), "R-in"),    // within [10:00, 10:05]
      (1L, ts("2024-01-01 10:07:00"), "R-out"),   // past the bound
      (2L, ts("2024-01-01 10:03:00"), "R-nokey")) // no left key
    q.processAllAvailable()
    val b1 = spark.table("swithin").select("l_tag", "r_tag")
      .as[(String, String)].collect().toSet
    assert(b1 == Set(("L1", "R-in")))

    // advance BOTH watermarks far past 10:05 (global wm = min over inputs),
    // then a further batch lets the state store evict L1's buffered row
    left.addData((7L, ts("2024-01-01 12:00:00"), "L-adv"))
    right.addData((8L, ts("2024-01-01 12:00:00"), "R-adv"))
    q.processAllAvailable()
    left.addData((7L, ts("2024-01-01 12:01:00"), "L-adv2"))
    right.addData((8L, ts("2024-01-01 12:01:00"), "R-adv2"))
    q.processAllAvailable()

    // a right row that WOULD match L1 arrives behind the watermark: the
    // left state is gone (and the row itself is late) — no new output
    right.addData((1L, ts("2024-01-01 10:04:00"), "R-late"))
    q.processAllAvailable()
    val all = spark.table("swithin").select("r_tag").as[String].collect().toSet
    assert(!all.contains("R-late"), s"late row matched after eviction: $all")
    assert(all == Set("R-in"))

    // state is bounded: buffered rows are the recent in-horizon ones, not
    // everything ever seen (eviction actually ran)
    val stateRows = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
    assert(stateRows <= 4, s"state holds $stateRows rows; eviction did not run")
    q.stop()
  }

  test("leftJoinWithin: match emitted promptly, no-match emitted null-padded after horizon") {
    val left = MemoryStream[(Long, Timestamp, String)](spark)
    val right = MemoryStream[(Long, Timestamp, String)](spark)
    val joined = StreamJoins.leftJoinWithin(
      left.toDF().toDF("k", "lts", "l_tag"),
      right.toDF().toDF("rk", "rts", "r_tag"),
      "k", "rk", "lts", "rts", watermark = "10 minutes", within = "5 minutes")
    val q = joined.writeStream.format("memory").queryName("sleft")
      .outputMode("append").start()

    left.addData(
      (1L, ts("2024-01-01 10:00:00"), "L-matched"),
      (2L, ts("2024-01-01 10:00:00"), "L-timeout")) // never gets a right row
    right.addData((1L, ts("2024-01-01 10:03:00"), "R-in"))
    q.processAllAvailable()
    val b1 = spark.table("sleft").select("l_tag", "r_tag")
      .as[(String, String)].collect().toSet
    assert(b1 == Set(("L-matched", "R-in")),
      s"unmatched row must NOT be emitted before its horizon passes: $b1")

    // advance both watermarks past 10:05 + 10min delay -> L-timeout's
    // no-match is now provable; two batches let eviction emit it
    left.addData((7L, ts("2024-01-01 12:00:00"), "L-adv"))
    right.addData((8L, ts("2024-01-01 12:00:00"), "R-adv"))
    q.processAllAvailable()
    left.addData((7L, ts("2024-01-01 12:01:00"), "L-adv2"))
    right.addData((8L, ts("2024-01-01 12:01:00"), "R-adv2"))
    q.processAllAvailable()

    val rows = spark.table("sleft")
      .select("l_tag", "r_tag").as[(String, String)].collect().toSet
    assert(rows.contains(("L-timeout", null)),
      s"timed-out left row should surface null-padded: $rows")
    assert(!rows.exists(r => r._1 == "L-matched" && r._2 == null),
      "matched row must not ALSO emit a null-padded copy")
    q.stop()
  }
}
