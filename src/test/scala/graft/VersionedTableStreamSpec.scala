package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.VersionedTable
import graft.streaming.{VersionedTableOffset, VersionedTableStream}

/** DataSource-V2 streaming source over the versioned table: version
  * offsets, append-only contract, checkpointed restart resume, and the
  * round trip through the streaming sink. */
class VersionedTableStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshDirs(): (String, String) = {
    val root = Files.createTempDirectory("vtstream")
    (root.resolve("t").toString, root.resolve("chk").toString)
  }

  /** Drain through the (recoverable) file sink and return the landed
    * keys — the memory sink cannot resume from a checkpoint. */
  private def drainToParquet(table: String, chk: String,
                             out: String): Seq[Long] = {
    val q = spark.readStream.format(VersionedTableStream.ShortName)
      .load(table)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    spark.read.parquet(out).select("k").as[Long].collect().toSeq.sorted
  }

  private def drainToMemory(table: String, chk: String, sinkName: String,
                            extra: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format(VersionedTableStream.ShortName)
    extra.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(table)
      .writeStream.format("memory").queryName(sinkName)
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
  }

  test("delivers appends across restarts exactly once") {
    val (t, chk) = freshDirs()
    val out = Files.createTempDirectory("vtstream_out").toString
    VersionedTable.append(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    VersionedTable.append(spark, t, Seq((3L, "c")).toDF("k", "s"))
    assert(drainToParquet(t, chk, out) === Seq(1L, 2L, 3L))
    // two more commits; resume from the checkpoint delivers ONLY them
    VersionedTable.append(spark, t, Seq((4L, "d")).toDF("k", "s"))
    VersionedTable.append(spark, t, Seq((5L, "e")).toDF("k", "s"))
    assert(drainToParquet(t, chk, out) === Seq(1L, 2L, 3L, 4L, 5L))
    // no new commits: a third restart adds nothing
    assert(drainToParquet(t, chk, out) === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("startingVersion skips history; maxVersionsPerBatch bounds batches") {
    val (t, chk) = freshDirs()
    (1L to 4L).foreach(i =>
      VersionedTable.append(spark, t, Seq((i, s"v$i")).toDF("k", "s")))
    drainToMemory(t, chk, "vts2",
      Map("startingVersion" -> "2", "maxVersionsPerBatch" -> "1"))
    assert(spark.table("vts2").select("k").as[Long].collect().sorted
      === Array(3L, 4L))
  }

  test("compaction commits are data-neutral and skipped") {
    val (t, chk) = freshDirs()
    val out = Files.createTempDirectory("vtstream_out3").toString
    VersionedTable.append(spark, t, Seq((1L, "a")).toDF("k", "s"))
    assert(drainToParquet(t, chk, out) === Seq(1L))
    VersionedTable.append(spark, t, Seq((2L, "b")).toDF("k", "s"))
    VersionedTable.compact(spark, t)
    VersionedTable.append(spark, t, Seq((3L, "c")).toDF("k", "s"))
    assert(drainToParquet(t, chk, out) === Seq(1L, 2L, 3L))
  }

  test("an upsert in the streamed range fails loudly") {
    val (t, chk) = freshDirs()
    VersionedTable.append(spark, t, Seq((1L, "a")).toDF("k", "s"))
    VersionedTable.upsert(spark, t, Seq((1L, "A")).toDF("k", "s"), Seq("k"))
    val ex = intercept[Exception] { drainToMemory(t, chk, "vts4") }
    def causes(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => x.getMessage +: causes(x.getCause))
    assert(causes(ex).exists(m => m != null && m.contains("change feed")))
  }

  test("sink-to-source round trip preserves rows and types") {
    val (t, chk) = freshDirs()
    val d = java.sql.Date.valueOf("1997-06-15")
    VersionedTable.append(spark, t,
      Seq((7L, "x", 2.5, d)).toDF("k", "s", "w", "d"))
    drainToMemory(t, chk, "vts5")
    val got = spark.table("vts5").as[(Long, String, Double, java.sql.Date)]
      .head()
    assert(got === ((7L, "x", 2.5, d)))
  }

  test("offset json round trips") {
    val o = VersionedTableOffset(42L)
    assert(o.json === "42")
  }

  test("exactly-once handoff: sink → versioned table → stream → downstream") {
    // the full lakehouse loop the reference runs with two Delta hops
    // (spark_stream.py lands a stream in Delta; downstream re-streams
    // it): upstream commits → VersionedTableSink (idempotent appendOnce
    // per batchId) → graft-vtable readStream → downstream parquet sink.
    // A REPLAYED sink epoch — checkpoint recovery's failure mode — must
    // not re-deliver rows downstream.
    val root = Files.createTempDirectory("vthandoff")
    val (up, mid) = (root.resolve("up").toString, root.resolve("mid").toString)
    val (chkA, chkB) = (root.resolve("chkA").toString, root.resolve("chkB").toString)
    val out = root.resolve("out").toString

    // stage 0: upstream versioned table gets two commits
    VersionedTable.append(spark, up, Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
    VersionedTable.append(spark, up, Seq((3L, "c")).toDF("k", "s"))

    // stage 1: stream upstream → VersionedTableSink into `mid`
    def hopA(): Unit = {
      val q = graft.streaming.VersionedTableSink.start(spark,
        spark.readStream.format(VersionedTableStream.ShortName).load(up),
        mid, chkA)
      q.awaitTermination(60000)
    }
    hopA()
    val headAfterFirst = VersionedTable.latestVersion(spark, mid).get

    // simulate checkpoint-recovery replay: re-deliver an already
    // committed epoch straight at the sink — appendOnce must skip it
    graft.streaming.VersionedTableSink.appendBatch(mid)(
      Seq((1L, "a"), (2L, "b")).toDF("k", "s"), 0L)
    assert(VersionedTable.latestVersion(spark, mid).get === headAfterFirst,
      "a replayed batchId must not create a new commit")

    // stage 2: stream `mid` → downstream parquet sink
    assert(drainToParquet(mid, chkB, out) === Seq(1L, 2L, 3L))

    // more upstream data: both hops resume from their checkpoints and
    // deliver ONLY the new rows — end-to-end exactly once
    VersionedTable.append(spark, up, Seq((4L, "d")).toDF("k", "s"))
    hopA()
    assert(drainToParquet(mid, chkB, out) === Seq(1L, 2L, 3L, 4L))
    // idle re-run of both hops changes nothing
    hopA()
    assert(drainToParquet(mid, chkB, out) === Seq(1L, 2L, 3L, 4L))
  }
}
