package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.functions.CountMin
import graft.streaming.CmsMonitor
import graft.streaming.CmsMonitor.Obs

/** Streaming CMS heavy-hitter monitor: cross-batch counter state
  * equals the batch sketch of the union, heavy items surface with
  * one-sided estimates, and the candidate set stays bounded. */
class CmsMonitorSpec extends SparkSpec {
  import spark.implicits._

  test("streaming counters equal the batch registers of the union") {
    val root = Files.createTempDirectory("graft_cmsmon").toString
    val in = MemoryStream[Obs](spark)
    val q = CmsMonitor.heavyHitters(in.toDS(), thresholdN = 30L).writeStream
      .format("memory").queryName("cms_hh")
      .option("checkpointLocation", s"$root/chk")
      .outputMode("append").start()
    // batch 1: items 1..50 once each; batch 2: item 7 another 40 times
    in.addData((1L to 50L).map(i => Obs("click", i)): _*)
    q.processAllAvailable()
    in.addData(Seq.fill(40)(Obs("click", 7L)): _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cms_hh").orderBy("n_batches").collect()
    assert(rows.length === 2)
    // batch 1: nothing reaches 30; batch 2: item 7 (41 hits) must appear
    assert(rows(0).getSeq[Long](rows(0).fieldIndex("items")).isEmpty)
    val items = rows(1).getSeq[Long](rows(1).fieldIndex("items"))
    val ests = rows(1).getSeq[Long](rows(1).fieldIndex("estimates"))
    assert(items.contains(7L))
    assert(ests(items.indexOf(7L)) >= 41L) // one-sided: never undercounts
    assert(rows(1).getAs[Long]("n_obs") === 90L)
    // cross-check against the batch twin over the unioned stream
    val union = ((1L to 50L) ++ Seq.fill(40)(7L)).toDF("k")
    val batchEst = CountMin.estimateTopK(union, "k", 1).collect().head
    assert(batchEst.getAs[Long]("key") === 7L)
    assert(batchEst.getAs[Long]("est_n") === ests(items.indexOf(7L)))
  }

  test("per-key isolation: a hot item in one key never leaks to another") {
    val root = Files.createTempDirectory("graft_cmsmon2").toString
    val in = MemoryStream[Obs](spark)
    val q = CmsMonitor.heavyHitters(in.toDS(), thresholdN = 10L).writeStream
      .format("memory").queryName("cms_iso")
      .option("checkpointLocation", s"$root/chk")
      .outputMode("append").start()
    in.addData(Seq.fill(20)(Obs("a", 99L)) ++ Seq(Obs("b", 99L)): _*)
    q.processAllAvailable()
    q.stop()
    val byKey = spark.table("cms_iso").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](r.fieldIndex("items"))).toMap
    assert(byKey("a") === Seq(99L))
    assert(byKey("b").isEmpty)
  }

  test("candidate set is bounded at MaxCandidates") {
    val root = Files.createTempDirectory("graft_cmsmon3").toString
    val in = MemoryStream[Obs](spark)
    // threshold 1: EVERY item is a candidate → eviction must bound state
    val q = CmsMonitor.heavyHitters(in.toDS(), thresholdN = 1L).writeStream
      .format("memory").queryName("cms_cap")
      .option("checkpointLocation", s"$root/chk")
      .outputMode("append").start()
    in.addData((1L to 500L).map(i => Obs("k", i)): _*)
    q.processAllAvailable()
    q.stop()
    val r = spark.table("cms_cap").collect().head
    assert(r.getSeq[Long](r.fieldIndex("items")).length <= CmsMonitor.MaxCandidates)
  }
}
