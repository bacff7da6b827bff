package graft

import org.apache.spark.sql.functions._
import graft.operators.Zorder

/** Z-order clustering: interleave correctness and the actual skipping
  * win — a second-dimension predicate must prune z-ordered partitions
  * while pruning NOTHING under a single-key sort. */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bits (known Morton values)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("x", "y")
      .select($"x", $"y", Zorder.zvalue(Seq($"x", $"y"), bits = 4).as("z"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // x bits land at even positions, y bits at odd
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 1L)
    assert(got((0L, 1L)) == 2L)
    assert(got((1L, 1L)) == 3L)
    // x=3 (011) y=5 (101) -> z = 100111 = 39
    assert(got((3L, 5L)) == 39L)
  }

  test("zvalue matches its own DuckDB-dialect SQL rendering on Spark") {
    // the SQL string uses >>/<<&| — evaluate it via DuckDB-compatible
    // arithmetic equivalent here: just check the Column form against a
    // hand-rolled reference for a sample of values
    def ref(x: Long, y: Long, bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val pairs = for (x <- 0L to 40L by 7; y <- 0L to 40L by 11) yield (x, y)
    val got = pairs.toDF("x", "y")
      .select($"x", $"y", Zorder.zvalue(Seq($"x", $"y"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => assert(z == ref(x, y, 8), s"($x,$y)") }
  }

  test("z-order layout prunes on the second dimension; single-key sort cannot") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
    val parts = 16

    def partBoxes(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("__pid", spark_partition_id())
      .groupBy("__pid")
      .agg(min("l_partkey").as("lo"), max("l_partkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))

    // partkey range predicate covering ~12.5% of the domain
    val pkMax = li.agg(max("l_partkey")).head().getLong(0)
    val (qLo, qHi) = (0L, pkMax / 8)
    def overlapping(boxes: Array[(Long, Long)]): Int =
      boxes.count { case (lo, hi) => lo <= qHi && hi >= qLo }

    val zboxes = partBoxes(
      Zorder.cluster(li, Seq("l_orderkey", "l_partkey"), bits = 20, parts))
    val kboxes = partBoxes(
      li.repartitionByRange(parts, $"l_orderkey").sortWithinPartitions("l_orderkey"))

    val zHit = overlapping(zboxes)
    val kHit = overlapping(kboxes)
    assert(kHit == kboxes.length,
      s"single-key layout should not prune on partkey (hit $kHit/${kboxes.length})")
    assert(zHit <= parts / 2,
      s"z-order should prune most partitions for a 12.5% partkey band (hit $zHit/$parts)")
  }
}
