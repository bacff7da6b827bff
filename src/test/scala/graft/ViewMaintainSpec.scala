package graft

import org.apache.spark.sql.functions._
import graft.operators.ViewMaintain
import graft.sources.VersionedTable
import graft.streaming.VersionedTableConsumer

/** Signed-merge ground truth plus the full poll-driven maintenance
  * loop over a real versioned table. */
class ViewMaintainSpec extends SparkSpec {
  import spark.implicits._

  test("applyChanges: update = delete+insert pair adjusts sum, not cnt") {
    val state = Seq(("a", 2L, 10L)).toDF("g", "cnt", "sum_v")
    val changes = Seq(("a", 3L, "delete"), ("a", 7L, "insert"))
      .toDF("g", "v", "_change_type")
    val got = ViewMaintain.applyChanges(state, changes, Seq("g"), Seq("v"))
      .as[(String, Long, Long)].collect()
    assert(got.toSeq === Seq(("a", 2L, 14L)))
  }

  test("applyChanges: a fully-deleted group vanishes from the view") {
    val state = Seq(("a", 2L, 10L), ("b", 1L, 5L)).toDF("g", "cnt", "sum_v")
    val changes = Seq(("a", 4L, "delete"), ("a", 6L, "delete"))
      .toDF("g", "v", "_change_type")
    val got = ViewMaintain.applyChanges(state, changes, Seq("g"), Seq("v"))
      .as[(String, Long, Long)].collect()
    assert(got.toSeq === Seq(("b", 1L, 5L)))
  }

  test("poll loop: cursor-driven maintenance converges to the head agg") {
    val dirBase = java.nio.file.Files.createTempDirectory("ivm_poll")
    val table = dirBase.resolve("t").toString
    val cursor = dirBase.resolve("cursor").toString
    def rows(xs: (String, Long)*) = xs.toDF("g", "v")
    VersionedTable.append(spark, table, rows(("a", 1L), ("b", 2L)))
    var state = ViewMaintain.initialState(
      VersionedTable.readVersion(spark, table, 0L), Seq("g"), Seq("v"))
      .localCheckpoint()
    // consumer starts AT version 0 (already folded into the state)
    VersionedTableConsumer.poll(spark, table, cursor)((_, _) => ())

    VersionedTable.append(spark, table, rows(("a", 10L), ("c", 3L)))
    VersionedTable.upsert(spark, table, rows(("b", 20L)), Seq("g") /* key */)
    // two commits since the cursor: ONE poll must deliver both
    val advanced = VersionedTableConsumer.poll(spark, table, cursor) {
      (feed, _) =>
        state = ViewMaintain.applyChanges(state, feed, Seq("g"), Seq("v"))
          .localCheckpoint()
    }
    assert(advanced === Some(2L))
    val direct = ViewMaintain.initialState(
      VersionedTable.read(spark, table), Seq("g"), Seq("v"))
    assert(state.orderBy("g").collect().toSeq
      === direct.orderBy("g").collect().toSeq)
    // nothing new -> poll is a no-op
    assert(VersionedTableConsumer.poll(spark, table, cursor)(
      (_, _) => fail("unexpected feed")) === None)
  }

  test("gated instance: final maintained state equals the head snapshot") {
    val got = ViewMaintain.ivmOrdersByYear(spark, sfDir)
    val v3 = got.filter(col("version") === 3L)
      .select("yr", "cnt", "sum_cents").orderBy("yr")
      .as[(Int, Long, Long)].collect()
    // the overwrite retains only 1998-onward orders
    assert(v3.nonEmpty && v3.map(_._1).toSeq.forall(_ >= 1998))
    val table = VersionedTable.buildOrdersTable(spark, sfDir, "ivm")
    val direct = VersionedTable.readVersion(spark, table, 3L)
      .withColumn("yr", year(col("d")).cast("int"))
      .groupBy("yr").agg(count(lit(1)).as("cnt"),
        sum("cents").as("sum_cents"))
      .orderBy("yr").as[(Int, Long, Long)].collect()
    assert(v3.toSeq === direct.toSeq)
  }
}
