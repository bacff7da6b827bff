package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.sources.PartitionedLayout

/** Partitioned lake layout: the roundtrip is value-lossless (that part
  * is also the DuckDB hash gate) and — the part a values gate can't see
  * — a filter on the partition column lands in the scan's
  * PartitionFilters, pruning directories at planning time instead of
  * filtering rows after the read. */
class PartitionedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private val path = "/tmp/graft_partlayout_spec"

  private def writeSample(): Unit = {
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0),
      (4L, "c", 40.0)).toDF("id", "part", "v")
    PartitionedLayout.writePartitioned(df, path, Seq("part"))
  }

  test("roundtrip preserves every row including the directory-encoded column") {
    writeSample()
    val back = PartitionedLayout.readPruned(spark, path,
      "id BIGINT, v DOUBLE, part STRING", lit(true))
      .select("id", "part", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(back == Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0),
      (4L, "c", 40.0)))
  }

  test("a partition-column filter prunes at planning time, not row time") {
    writeSample()
    val pruned = PartitionedLayout.readPruned(spark, path,
      "id BIGINT, v DOUBLE, part STRING", col("part") === "a")
    assert(pruned.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    // the filter must live in partitionFilters (directory pruning) and
    // NOT survive as a post-scan data filter
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "part")))
    assert(!scan.dataFilters.exists(_.references.exists(_.name == "part")))
    // and the scan must actually read fewer files than the full layout
    val all = PartitionedLayout.readPruned(spark, path,
      "id BIGINT, v DOUBLE, part STRING", lit(true))
    val allScan = all.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    assert(scan.selectedPartitions.totalNumberOfFiles <
      allScan.selectedPartitions.totalNumberOfFiles)
  }

  test("dynamic overwrite rewrites only the batch's partitions, others keep their files") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_dynow").toString
    val base = Seq((1L, 1.0, "a"), (2L, 2.0, "b"), (3L, 3.0, "a"),
      (4L, 4.0, "c")).toDF("id", "v", "part")
    PartitionedLayout.writePartitioned(base, path, Seq("part"))
    def files(p: String): Set[String] =
      Option(new java.io.File(s"$path/part=$p").listFiles()).toSeq.flatten
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName + ":" + f.lastModified()).toSet
    val bBefore = files("b"); val cBefore = files("c")
    // overwrite ONLY partition a with new content
    val batch = Seq((9L, 9.0, "a")).toDF("id", "v", "part")
    PartitionedLayout.overwritePartitions(batch, path, Seq("part"))
    assert(files("b") == bBefore && files("c") == cBefore,
      "untouched partitions were rewritten")
    val got = PartitionedLayout.readPruned(spark, path,
        "id BIGINT, v DOUBLE, part STRING", lit(true))
      .as[(Long, Double, String)].collect().toSet
    assert(got == Set((9L, 9.0, "a"), (2L, 2.0, "b"), (4L, 4.0, "c")),
      s"overwrite content wrong: $got")
    // the flag is restored after the call
    assert(spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .forall(_ != "dynamic") ||
      spark.conf.getOption("spark.sql.sources.partitionOverwriteMode").isEmpty)
  }
}
