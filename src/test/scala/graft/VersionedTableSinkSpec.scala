package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.VersionedTable
import graft.streaming.VersionedTableSink

/** Streaming sink into the versioned table: one commit per micro-batch
  * with the batchId as txn, replay-idempotent, readable through the
  * full table surface (time travel + change feed) afterwards. */
class VersionedTableSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("vtsink").resolve("t").toString

  test("stream drains into versioned commits; restart adds nothing") {
    val root = Files.createTempDirectory("vtsink_chk").toString
    val t = freshTable()
    val mem = MemoryStream[(Long, String)](spark)
    mem.addData((1L, "a"), (2L, "b"))
    mem.addData((3L, "c"))
    val q = VersionedTableSink.start(spark,
      mem.toDF().toDF("k", "s"), t, s"$root/chk")
    q.awaitTermination(60000)

    assert(VersionedTable.read(spark, t).count() == 3L)
    // same checkpoint, no new data: restart must not duplicate
    val q2 = VersionedTableSink.start(spark,
      mem.toDF().toDF("k", "s"), t, s"$root/chk")
    q2.awaitTermination(60000)
    assert(VersionedTable.read(spark, t).count() == 3L)
  }

  test("appendOnce: replayed and stale batch ids are skipped under the lock") {
    val t = freshTable()
    assert(VersionedTable.appendOnce(spark, t,
      Seq((1L, "a")).toDF("k", "s"), 0L).contains(0L))
    assert(VersionedTable.appendOnce(spark, t,
      Seq((2L, "b")).toDF("k", "s"), 1L).contains(1L))
    // replay of batch 1 and a stale batch 0: both no-ops
    assert(VersionedTable.appendOnce(spark, t,
      Seq((2L, "b")).toDF("k", "s"), 1L).isEmpty)
    assert(VersionedTable.appendOnce(spark, t,
      Seq((1L, "a")).toDF("k", "s"), 0L).isEmpty)
    assert(VersionedTable.read(spark, t).count() == 2L)
    assert(VersionedTable.lastTxn(spark, t) == 1L)
    // non-txn commits in between do not disturb the txn watermark
    VersionedTable.compact(spark, t)
    assert(VersionedTable.lastTxn(spark, t) == 1L)
    assert(VersionedTable.appendOnce(spark, t,
      Seq((3L, "c")).toDF("k", "s"), 2L).isDefined)
  }

  test("consumer: polls exactly the new versions, cursor survives restarts") {
    import graft.streaming.VersionedTableConsumer
    val t = freshTable()
    val cursor = Files.createTempDirectory("vtcur").resolve("cursor").toString
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    def drain(): Unit =
      VersionedTableConsumer.poll(spark, t, cursor) { (feed, v) =>
        seen += ((v, feed.filter($"_change_type" === "insert")
          .select("k").as[Long].collect().toSet))
      }
    VersionedTable.append(spark, t, Seq((1L, "a")).toDF("k", "s"))
    drain()
    assert(seen.toList == List((0L, Set(1L))))
    // nothing new: poll is a no-op, cursor untouched
    drain()
    assert(seen.size == 1)
    // two more commits, one poll: feed covers BOTH versions at once
    VersionedTable.append(spark, t, Seq((2L, "b")).toDF("k", "s"))
    VersionedTable.append(spark, t, Seq((3L, "c")).toDF("k", "s"))
    drain()
    assert(seen.toList == List((0L, Set(1L)), (2L, Set(2L, 3L))))
    assert(VersionedTableConsumer.position(spark, cursor) == 2L)
  }

  test("committed batches are incrementally consumable via the change feed") {
    val t = freshTable()
    VersionedTable.appendOnce(spark, t, Seq((1L, "a")).toDF("k", "s"), 0L)
    VersionedTable.appendOnce(spark, t,
      Seq((2L, "b"), (3L, "c")).toDF("k", "s"), 1L)
    val feed = VersionedTable.changesBetween(spark, t, 0L, 1L)
      .select("_change_type", "k").as[(String, Long)].collect().toSet
    assert(feed == Set(("insert", 2L), ("insert", 3L)))
  }
}
