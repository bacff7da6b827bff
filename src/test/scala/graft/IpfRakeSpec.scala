package graft

import graft.operators.IpfRake

/** Raking contracts: margins converge to the targets (within milli
  * truncation), a uniform sample with proportional targets is a
  * fixpoint, and structural zeros stay absent. */
class IpfRakeSpec extends SparkSpec {
  import spark.implicits._

  test("proportional targets are an exact fixpoint") {
    val cells = Seq(("x", 0L, 10L), ("x", 1L, 10L),
      ("y", 0L, 10L), ("y", 1L, 10L)).toDF("a", "b", "n")
    val rowT = Seq(("x", 20L), ("y", 20L)).toDF("a", "ta")
    val colT = Seq((0L, 20L), (1L, 20L)).toDF("b", "tb")
    val out = IpfRake.rake(cells, rowT, colT, 3).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("w_milli") == 1000L)
      assert(r.getAs[Long]("est") == 10L)
    }
  }

  test("margins converge to skewed targets within truncation slack") {
    val cells = Seq(("x", 0L, 10L), ("x", 1L, 10L),
      ("y", 0L, 10L), ("y", 1L, 10L)).toDF("a", "b", "n")
    val rowT = Seq(("x", 30L), ("y", 10L)).toDF("a", "ta")
    val colT = Seq((0L, 24L), (1L, 16L)).toDF("b", "tb")
    val out = IpfRake.rake(cells, rowT, colT, 3).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("est")).toMap
    val rowX = out(("x", 0L)) + out(("x", 1L))
    val rowY = out(("y", 0L)) + out(("y", 1L))
    val col0 = out(("x", 0L)) + out(("y", 0L))
    val col1 = out(("x", 1L)) + out(("y", 1L))
    assert(math.abs(rowX - 30L) <= 1 && math.abs(rowY - 10L) <= 1,
      s"row margins ($rowX, $rowY) must approach (30, 10)")
    assert(math.abs(col0 - 24L) <= 1 && math.abs(col1 - 16L) <= 1,
      s"col margins ($col0, $col1) must approach (24, 16)")
  }

  test("structural zeros stay absent") {
    val cells = Seq(("x", 0L, 10L), ("x", 1L, 10L), ("y", 1L, 10L))
      .toDF("a", "b", "n") // no (y, 0) cell
    val rowT = Seq(("x", 20L), ("y", 10L)).toDF("a", "ta")
    val colT = Seq((0L, 10L), (1L, 20L)).toDF("b", "tb")
    val out = IpfRake.rake(cells, rowT, colT, 3).collect()
    assert(out.length == 3)
    assert(!out.exists(r => r.getString(0) == "y" && r.getLong(1) == 0L))
  }

  test("gated instance: 25 cells, weights positive") {
    val out = IpfRake.rakeOrders(spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 25)
    out.foreach(r => assert(r.getAs[Long]("w_milli") > 0L))
  }
}
