package graft

import java.nio.file.Files
import graft.sources.VersionedTable
import org.apache.spark.sql.functions._

/** Contracts of merge-on-read deletion vectors: a delete commit retires
  * rows WITHOUT rewriting data files; reads at and after the delete
  * version apply the vector; time travel before it does not; deletes
  * compose; compaction materializes and clears the vectors; the pruned
  * MERGE keeps vectors live for skipped groups; the change feed emits
  * the retired rows as deletes; and the version-offset stream refuses a
  * range containing a delete commit. */
class DvDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("vtable_dv").resolve("t").toString

  private def rows(t: String, v: Long): Set[(Long, String, Long)] =
    VersionedTable.readVersion(spark, t, v)
      .as[(Long, String, Long)].collect().toSet

  private def dataDirNames(t: String): Seq[String] = {
    val d = new java.io.File(t, "data")
    Option(d.list()).map(_.toSeq).getOrElse(Nil)
  }

  test("delete retires matching rows without rewriting data files") {
    val t = freshTable()
    VersionedTable.append(spark, t,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "v"))
    val before = dataDirNames(t).toSet
    val v1 = VersionedTable.delete(spark, t, col("v") >= 20L)
    assert(v1 == 1L)
    assert(rows(t, 1) == Set((1L, "a", 10L)))
    assert(rows(t, 0) == Set((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)),
      "time travel below the delete version must not see the vector")
    val after = dataDirNames(t).toSet
    assert(before.subsetOf(after), "delete must not rewrite data groups")
    assert((after -- before).forall(_.startsWith("dv-")),
      "a delete adds exactly deletion-vector groups")
    assert(VersionedTable.history(spark, t).map(_.op) ==
      Seq("append", "delete"))
  }

  test("deletes compose; a zero-match delete is a readable no-op version") {
    val t = freshTable()
    VersionedTable.append(spark, t,
      (1L to 10L).map(k => (k, s"s$k", k * 10L)).toDF("k", "s", "v"))
    VersionedTable.delete(spark, t, col("k") % 2 === 0)
    VersionedTable.delete(spark, t, col("k") % 3 === 0)
    assert(rows(t, 2).map(_._1) == Set(1L, 5L, 7L),
      "second vector composes with the first against the same group")
    val v3 = VersionedTable.delete(spark, t, col("k") > 100L)
    assert(v3 == 3L)
    assert(rows(t, 3).map(_._1) == Set(1L, 5L, 7L),
      "an empty deletion vector reads as zero retired rows")
  }

  test("compaction materializes the vectors and clears them") {
    val t = freshTable()
    VersionedTable.append(spark, t,
      (1L to 8L).map(k => (k, s"s$k", k)).toDF("k", "s", "v"))
    VersionedTable.delete(spark, t, col("k") <= 4L)
    val kept = rows(t, 1)
    VersionedTable.compact(spark, t)
    assert(rows(t, 2) == kept, "compaction is a logical no-op")
    VersionedTable.vacuum(spark, t, retainVersions = 1, minAgeMillis = 0L)
    assert(dataDirNames(t).forall(d => !d.startsWith("dv-")),
      "materialized vectors are reclaimable — none survive vacuum")
    assert(rows(t, 2) == kept)
  }

  test("pruned MERGE keeps vectors live so skipped groups stay deleted") {
    val t = freshTable()
    // two key-disjoint groups with zonemap sidecars
    VersionedTable.appendKeyed(spark, t,
      (1L to 5L).map(k => (k, k * 10L)).toDF("k", "v"), "k")
    VersionedTable.appendKeyed(spark, t,
      (100L to 105L).map(k => (k, k * 10L)).toDF("k", "v"), "k")
    // vector retires one row in EACH group
    VersionedTable.delete(spark, t, col("k") === 2L || col("k") === 101L)
    // changeset confined to the low group: high group must be skipped
    val (_, rewritten, skipped) = VersionedTable.upsertPruned(spark, t,
      Seq((3L, 999L)).toDF("k", "v"), "k")
    assert(rewritten == 1 && skipped == 1)
    val got = VersionedTable.read(spark, t)
      .as[(Long, Long)].collect().toMap
    assert(!got.contains(2L), "rewritten group materialized its delete")
    assert(!got.contains(101L),
      "vector must stay live for the skipped group's deleted row")
    assert(got(3L) == 999L, "the merge itself applied")
    assert(got.keySet == ((1L to 5L).toSet - 2L) ++ ((100L to 105L).toSet - 101L))
  }

  test("change feed across a delete emits exactly the retired rows") {
    val t = freshTable()
    VersionedTable.append(spark, t,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "s", "v"))
    VersionedTable.delete(spark, t, col("k") === 2L)
    val feed = VersionedTable.changesBetween(spark, t, 0L, 1L)
      .select("_change_type", "k", "s", "v")
      .as[(String, Long, String, Long)].collect().toSet
    assert(feed == Set(("delete", 2L, "b", 20L)))
    // delete-then-append range: both row-level effects surface
    VersionedTable.append(spark, t, Seq((4L, "d", 40L)).toDF("k", "s", "v"))
    val feed2 = VersionedTable.changesBetween(spark, t, 0L, 2L)
      .select("_change_type", "k", "s", "v")
      .as[(String, Long, String, Long)].collect().toSet
    assert(feed2 == Set(("delete", 2L, "b", 20L), ("insert", 4L, "d", 40L)))
  }

  test("version-offset streaming refuses a range containing a delete") {
    val root = Files.createTempDirectory("vtstream_dv")
    val t = root.resolve("t").toString
    VersionedTable.append(spark, t, Seq((1L, "a", 10L)).toDF("k", "s", "v"))
    VersionedTable.delete(spark, t, col("k") === 1L)
    val q = spark.readStream
      .format(graft.streaming.VersionedTableStream.ShortName)
      .load(t)
      .writeStream.format("memory").queryName("dv_stream_refusal")
      .option("checkpointLocation", root.resolve("chk").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val e = intercept[Exception] { q.awaitTermination(60000) }
    assert(e.getMessage.contains("delete"),
      s"stream over a delete commit must fail loudly, got: ${e.getMessage}")
  }

  test("gated instance: well-formed on sf0.001") {
    val out = VersionedTable.tableDvDelete(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 4)
    val byV = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byV(0L) > byV(1L) && byV(1L) > byV(2L),
      "each delete strictly shrinks the snapshot on this data")
    assert(byV(2L) == byV(3L), "compaction preserves the row count")
  }
}
