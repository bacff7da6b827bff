package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.UpsertSink

/** Streaming merge-upsert sink: micro-batches maintain a versioned
  * parquet dimension with SCD-current semantics, pointer-swap commits,
  * and idempotent batch replay. */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batches merge into the dim; replayed batch is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = Files.createTempDirectory("graft_upsert_state").toString
    val chk = Files.createTempDirectory("graft_upsert_chk").toString

    val in = MemoryStream[(Long, String, Long)](spark)
    val q = UpsertSink.start(in.toDF().toDF("k", "v", "seq"),
      stateDir, chk, naturalKey = Seq("k"), orderCol = "seq",
      compareCols = Seq("v"))

    in.addData((1L, "a", 1L), (2L, "b", 1L))
    q.processAllAvailable()
    val s1 = UpsertSink.currentState(spark, stateDir).get
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(s1 == Set((1L, "a", 1), (2L, "b", 1)))

    // update key 1 (stale row 1a must lose to seq order), insert key 3
    in.addData((1L, "a2", 3L), (1L, "a1-stale", 2L), (3L, "c", 2L))
    q.processAllAvailable()
    q.stop()
    def state() = UpsertSink.currentState(spark, stateDir).get
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val s2 = state()
    assert(s2 == Set((1L, "a", 0), (1L, "a2", 1), (2L, "b", 1), (3L, "c", 1)),
      s"post-merge state wrong: $s2")
    val (_, lastBatch) = UpsertSink.currentPointer(stateDir).get

    // checkpoint-recovery replay of the LAST batch must not double-apply
    val replay = Seq((1L, "a2", 3L), (3L, "c", 2L)).toDF("k", "v", "seq")
    UpsertSink.writeBatch(replay, lastBatch, stateDir,
      Seq("k"), "seq", Seq("v"))
    assert(state() == s2, "replayed batch mutated the dim")

    // a genuinely new batch still applies
    val next = Seq((2L, "b2", 9L)).toDF("k", "v", "seq")
    UpsertSink.writeBatch(next, lastBatch + 1, stateDir,
      Seq("k"), "seq", Seq("v"))
    assert(state() == Set((1L, "a", 0), (1L, "a2", 1),
      (2L, "b", 0), (2L, "b2", 1), (3L, "c", 1)))
  }

  test("time travel: every committed version reproduces its snapshot; as-of and prune honor history") {
    val stateDir = Files.createTempDirectory("graft_tt_state").toString
    def write(batchId: Long, rows: Seq[(Long, String, Long)]): Unit =
      UpsertSink.writeBatch(rows.toDF("k", "v", "seq"), batchId, stateDir,
        Seq("k"), "seq", Seq("v"))
    def read(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet

    write(0L, Seq((1L, "a", 1L)))
    val s0 = read(UpsertSink.currentState(spark, stateDir).get)
    write(1L, Seq((2L, "b", 2L)))
    val s1 = read(UpsertSink.currentState(spark, stateDir).get)
    write(2L, Seq((1L, "a2", 3L)))
    val s2 = read(UpsertSink.currentState(spark, stateDir).get)
    assert(s0 != s1 && s1 != s2, "fixture batches must change state")

    // each historical version reproduces its exact snapshot
    assert(read(UpsertSink.stateAtVersion(spark, stateDir, 0L)) == s0)
    assert(read(UpsertSink.stateAtVersion(spark, stateDir, 1L)) == s1)
    assert(read(UpsertSink.stateAtVersion(spark, stateDir, 2L)) == s2)

    // as-of: between commit times resolves to the earlier version;
    // before all history resolves to none
    val hist = UpsertSink.versionHistory(stateDir)
    assert(hist.map(_.batchId) == Seq(0L, 1L, 2L))
    assert(hist.map(_.commitMillis) == hist.map(_.commitMillis).sorted)
    assert(read(UpsertSink.stateAsOf(spark, stateDir, hist(1).commitMillis).get) == s1)
    assert(UpsertSink.stateAsOf(spark, stateDir, hist(0).commitMillis - 1).isEmpty)

    // prune: oldest dropped, reads at pruned versions fail, current survives
    val dropped = UpsertSink.pruneVersions(stateDir, keepLast = 2)
    assert(dropped.map(_.batchId) == Seq(0L))
    intercept[NoSuchElementException] {
      UpsertSink.stateAtVersion(spark, stateDir, 0L)
    }
    assert(read(UpsertSink.stateAtVersion(spark, stateDir, 2L)) == s2)
    assert(read(UpsertSink.currentState(spark, stateDir).get) == s2)
  }

  test("change feed between versions classifies insert/update/delete over current rows") {
    val stateDir = Files.createTempDirectory("graft_cdf_state").toString
    def write(batchId: Long, rows: Seq[(Long, String, Long)]): Unit =
      UpsertSink.writeBatch(rows.toDF("k", "v", "seq"), batchId, stateDir,
        Seq("k"), "seq", Seq("v"))
    write(0L, Seq((1L, "a", 1L), (2L, "b", 1L)))
    write(1L, Seq((1L, "a2", 2L), (3L, "c", 2L))) // update 1, insert 3

    val feed = UpsertSink.changesBetween(spark, stateDir, 0L, 1L,
        naturalKey = Seq("k"), compareCols = Seq("v"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(feed == Map(
      1L -> (("update", "a", "a2")),
      2L -> (("unchanged", "b", "b")),
      3L -> (("insert", null, "c"))), s"change feed wrong: $feed")

    // the superseded SCD row for key 1 inside v1 is history, not a
    // change — the feed above must not have emitted a delete for it;
    // a same-version feed is all-unchanged
    val self = UpsertSink.changesBetween(spark, stateDir, 1L, 1L,
        Seq("k"), Seq("v"))
      .select("change_type").distinct().collect().map(_.getString(0)).toSeq
    assert(self == Seq("unchanged"))
  }
}
