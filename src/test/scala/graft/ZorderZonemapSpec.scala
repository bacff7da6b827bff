package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Zorder

/** Z-order range-id layout × zone-map audit: the interleaved layout
  * must skip PHYSICAL parquet files for predicates on EACH clustered
  * key — the `OPTIMIZE ZORDER BY` payoff, measured on real file
  * footers, not just the relational audit. */
class ZorderZonemapSpec extends SparkSpec {
  import spark.implicits._

  test("rank buckets are exact rank quantiles, stable across partitionings") {
    val df = (1L to 100L).map(v => v * v).toDF("v") // skewed domain
    val b = Zorder.rankBuckets(df, "v", 16)
      .orderBy("__v").as[(Long, Long)].collect()
    // exactly 100/16-ish values per bucket, monotone in value
    assert(b.map(_._2).toSeq == b.map(_._2).sorted.toSeq)
    val sizes = b.groupBy(_._2).view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"rank buckets must be balanced: $sizes")
    val b4 = Zorder.rankBuckets(df.repartition(7), "v", 16)
      .orderBy("__v").as[(Long, Long)].collect()
    assert(b4.toSeq == b.toSeq, "bucketing must not depend on partitioning")
  }

  test("physical write: predicates on EACH key skip files > 0") {
    val z = Zorder.rangeIds(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey"),
      "l_orderkey", "l_partkey")
    val dir = Files.createTempDirectory("graft_zorder").toString
    z.repartitionByRange(8, col("range_id"))
      .sortWithinPartitions("range_id")
      .write.mode("overwrite").parquet(dir)
    // per-FILE zone maps read back from the real files
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq
    assert(files.size > 1, "need multiple files for skipping to mean anything")
    val zonemaps = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_orderkey"), max("l_orderkey"),
          min("l_partkey"), max("l_partkey")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // data-derived quartile predicates (the spec SF's domains are tiny)
    val Array(q1o, q1p) = Tables.lineitem(spark, sfDir)
      .stat.approxQuantile(Array("l_orderkey", "l_partkey"), Array(0.25), 0.0)
      .map(_.head.toLong)
    val skippedByOrder = zonemaps.count(_._1 > q1o)
    val skippedByPart = zonemaps.count(_._3 > q1p)
    assert(skippedByOrder > 0,
      s"l_orderkey <= $q1o must skip files: $zonemaps")
    assert(skippedByPart > 0,
      s"l_partkey <= $q1p must skip files: $zonemaps")
    // zone maps never lie: a skipped file contains zero matches
    zonemaps.zip(files).foreach { case ((mnO, _, mnP, _), f) =>
      if (mnO > q1o)
        assert(spark.read.parquet(f).filter($"l_orderkey" <= q1o).count() == 0)
      if (mnP > q1p)
        assert(spark.read.parquet(f).filter($"l_partkey" <= q1p).count() == 0)
    }
  }

  test("gated audit: both dims prune zones and scanned covers every match") {
    val out = Zorder.zorderZonemap(spark, sfDir)
    val byDim = out.groupBy("dim").agg(
        first("zones_total").as("zt"), first("zones_scanned").as("zs"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    Seq("l_orderkey", "l_partkey").foreach { d =>
      val (zt, zs) = byDim(d)
      assert(zs < zt, s"$d predicate must prune zones ($zs of $zt scanned)")
      assert(zs > 0, s"$d predicate must scan something")
    }
    // no skipped zone carries matches
    assert(out.filter(!col("scanned") && col("n_matched") > 0).count() == 0)
  }
}
