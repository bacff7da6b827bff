package graft

import org.apache.spark.sql.functions._
import graft.functions.CountMin

/** Count-Min invariants: row mass conservation, one-sided error,
  * exactness when a key's cells are collision-free, and the
  * deterministic top-k tie order. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("every hash row conserves total mass N") {
    val keys = (1L to 500L).flatMap(k => Seq.fill((k % 7 + 1).toInt)(k))
    val regs = CountMin.registers(keys.toDF("k"), "k")
    val perRow = regs.groupBy("row_j").agg(sum("cnt").as("s"))
      .select("s").as[Long].collect()
    assert(perRow.length === CountMin.D)
    assert(perRow.forall(_ === keys.length.toLong))
    assert(regs.count() === (CountMin.D * CountMin.W).toLong)
  }

  test("estimates are one-sided: est_n >= exact_n for every probed key") {
    val keys = (1L to 2000L).flatMap(k => Seq.fill((k % 13 + 1).toInt)(k))
    val est = CountMin.estimateTopK(keys.toDF("k"), "k", 10)
    assert(est.count() === 10)
    assert(est.filter(col("est_n") < col("exact_n")).count() === 0)
    assert(est.filter(col("over_n") < 0).count() === 0)
  }

  test("a lone key in an otherwise empty sketch estimates exactly") {
    val est = CountMin.estimateTopK(
      Seq.fill(42)(7L).toDF("k"), "k", 1).collect().head
    assert(est.getAs[Long]("exact_n") === 42L)
    assert(est.getAs[Long]("est_n") === 42L) // no other keys → no collision
    assert(est.getAs[Long]("over_n") === 0L)
  }

  test("top-k ties break by key ascending") {
    val keys = Seq(5L, 5L, 3L, 3L, 9L).toDF("k") // 5 and 3 tie at n=2
    val top = CountMin.estimateTopK(keys, "k", 2)
      .select("key").as[Long].collect().toSet
    assert(top === Set(3L, 5L))
  }

  test("gated instances: register spine is D x W at sf0.001") {
    assert(CountMin.cmsLineitem(spark, sfDir).count() ===
      (CountMin.D * CountMin.W).toLong)
    assert(CountMin.cmsTopParts(spark, sfDir).count() === 5)
  }
}
