package graft

import org.apache.spark.sql.functions._
import graft.functions.GoodTuring

/** Good-Turing count-of-counts: hand-computed planted corpus, NULL
  * where N_{r+1}=0, and a well-formed gated table. */
class GoodTuringSpec extends SparkSpec {
  import spark.implicits._

  test("planted corpus: r* = (r+1)N_{r+1}/N_r in permicro, exact") {
    // terms: a×3, b×2, c×1  →  N_1=N_2=N_3=1, T=6
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("w")
    val out = GoodTuring.countOfCounts(df, "w").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(1L).getAs[Long]("r_star_permicro") === 2000000L) // 2·1/1
    assert(out(2L).getAs[Long]("r_star_permicro") === 3000000L) // 3·1/1
    assert(out(3L).isNullAt(out(3L).fieldIndex("r_star_permicro")))
    // unseen mass: N_1/T = 1/6
    assert(out(1L).getAs[Long]("p0_permicro") === 166666L)
  }

  test("count-of-counts partitions the vocabulary") {
    val df = Seq("x", "x", "y", "z", "z", "z", "w").toDF("w")
    val out = GoodTuring.countOfCounts(df, "w").collect()
    assert(out.map(r => r.getLong(0) * 0 + r.getLong(1)).sum === 4L) // 4 types
    assert(out.map(r => r.getLong(0) * r.getLong(1)).sum === 7L)     // 7 tokens
  }

  test("gated instance: well-formed over sf0.001 documents") {
    val out = GoodTuring.goodTuringDocuments(spark, sfDir).collect()
    assert(out.nonEmpty)
    val p0 = out.head.getAs[Long]("p0_permicro")
    assert(p0 >= 0L && p0 <= 1000000L)
    out.foreach { r =>
      assert(r.getLong(0) >= 1L && r.getLong(1) >= 1L)
    }
  }
}
