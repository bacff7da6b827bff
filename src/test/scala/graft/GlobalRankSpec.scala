package graft

import org.apache.spark.sql.functions._
import graft.operators.Ranks

/** Regression gate for the round-10 globalRowNumber bug class: the
  * stitched rank must be a PERMUTATION of 1..N consistent with the
  * requested order, under any input partitioning and with heavy ties —
  * the failure mode was duplicate/overrun row numbers when the two
  * consumers of the range exchange sampled different boundaries. */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber: permutation of 1..N, order-consistent, any partitioning") {
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val n = 5000
    // heavy ties: only 17 distinct sort values over 5000 rows
    val df = (0 until n).map(i => (i.toLong, math.abs(mix(i.toLong)) % 17))
      .toDF("id", "v")
    for (parts <- Seq(1, 3, 16)) {
      val got = Ranks.globalRowNumber(df.repartition(parts),
          Seq(col("v"), col("id")), "grn")
        .select("id", "v", "grn").as[(Long, Long, Long)].collect()
      assert(got.length == n)
      val ranks = got.map(_._3).sorted
      assert(ranks.head == 1L && ranks.last == n.toLong &&
        ranks.distinct.length == n,
        s"parts=$parts: not a permutation of 1..$n")
      // rank order agrees with the requested total order
      val byRank = got.sortBy(_._3).map(r => (r._2, r._1))
      assert(byRank.sameElements(byRank.sorted),
        s"parts=$parts: rank order violates (v, id) order")
    }
  }

  test("ntileExact: bucket sizes are exactly the SQL ntile contract") {
    val df = (1L to 103L).map(i => (i, i % 7)).toDF("id", "v")
    val got = Ranks.ntileExact(df, Seq(col("v"), col("id")), 10, "b")
      .groupBy("b").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 103 = 10*10 + 3: buckets 1..3 hold 11, buckets 4..10 hold 10
    assert((1 to 3).forall(got(_) == 11L) && (4 to 10).forall(got(_) == 10L),
      s"bucket sizes wrong: $got")
  }
}
