package graft

import org.apache.spark.sql.functions._
import graft.operators.BomExplode

/** BOM quantity explosion: path-product/sum semantics on a hand DAG —
  * the duplicate-child multiplication parent_child_recursion.py's
  * nextExtras implements. */
class BomExplodeSpec extends SparkSpec {
  import spark.implicits._

  test("diamond DAG: quantities multiply along paths and sum across them") {
    //      1
    //    2x/ \x3
    //    2     3
    //    5x\ /x7        node 4 via 2: 2*5=10; via 3: 3*7=21 -> 31, 2 paths
    //      4
    //      |x10         node 9 inherits both: 31*10 = 310, 2 paths
    //      9
    val edges = Seq((1L, 2L, 2L), (1L, 3L, 3L), (2L, 4L, 5L),
      (3L, 4L, 7L), (4L, 9L, 10L)).toDF("parent", "child", "qty")
    val roots = Seq(1L).toDF("r")
    val got = BomExplode.explode(edges, "parent", "child", "qty", roots)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    assert(got(1L) == ((1L, 1L)))
    assert(got(2L) == ((1L, 2L)))
    assert(got(3L) == ((1L, 3L)))
    assert(got(4L) == ((2L, 31L)))
    assert(got(9L) == ((2L, 310L)))
  }

  test("unequal-depth re-arrival still sums per path") {
    // 1 -> 4 direct (qty 2) AND 1 -> 2 -> 4 (3*5): total 2 + 15 = 17
    val edges = Seq((1L, 4L, 2L), (1L, 2L, 3L), (2L, 4L, 5L))
      .toDF("parent", "child", "qty")
    val got = BomExplode.explode(edges, "parent", "child", "qty",
        Seq(1L).toDF("r"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    assert(got(4L) == ((2L, 17L)))
  }

  test("gated instance: multi-parent keys carry n_paths >= 2") {
    val out = BomExplode.bomExplodeCustomers(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // roots present at qty 1
    out.filter(r => r._1 == r._2).foreach { r =>
      assert(r._3 == 1L && r._4 == 1L)
    }
    // the div-7 second parents create genuine multi-path nodes
    assert(out.exists(_._3 >= 2L), "expected multi-path nodes")
    // total_qty >= n_paths always (every edge qty >= 1)
    out.foreach { r => assert(r._4 >= r._3) }
  }
}
