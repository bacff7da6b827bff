package graft

import graft.operators.GraphMetrics

/** Planted-graph ground truth for clustering coefficient, degree
  * assortativity, and bounded-round k-core peeling. */
class GraphExtrasSpec extends SparkSpec {
  import spark.implicits._

  test("clustering coefficient: triangle + pendant, hand values") {
    // K3 on {1,2,3} plus pendant edge 3-4
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val got = GraphMetrics.clusteringCoeff(e)
      .select("node", "degree", "triangles", "cc_permicro")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((2L, 1L, 1000000L)))
    assert(got(2L) === ((2L, 1L, 1000000L)))
    assert(got(3L) === ((3L, 1L, 333333L))) // 2e6/6 truncated
    assert(got(4L) === ((1L, 0L, 0L)))
  }

  test("assortativity: a perfect star scores exactly -1") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val got = GraphMetrics.assortativity(e)
      .select("m", "sx", "sxx", "sxy", "assort_permicro")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got === ((6L, 12L, 30L, 18L, -1000000L)))
  }

  test("assortativity: a regular graph is degenerate (NULL r)") {
    // 4-cycle: every degree 2 -> zero variance -> divisor 0 -> NULL
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val row = GraphMetrics.assortativity(e).head()
    assert(row.isNullAt(row.fieldIndex("assort_permicro")))
  }

  test("kcore peel: K4 with a tail settles to the 3-core in one round") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("u", "v")
    val got = GraphMetrics.kcorePeelRounds(e, k = 3, rounds = 3)
      .select("round", "n_nodes", "n_edges")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got === Array((0, 6L, 8L), (1, 4L, 6L), (2, 4L, 6L),
      (3, 4L, 6L)))
  }

  test("kcore peel: cascading collapse of a path at k = 2") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val got = GraphMetrics.kcorePeelRounds(e, k = 2, rounds = 3)
      .select("round", "n_nodes", "n_edges")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    // round1 drops the endpoints, round2 drops the stranded middle edge
    assert(got === Array((0, 4L, 3L), (1, 2L, 1L), (2, 0L, 0L),
      (3, 0L, 0L)))
  }
}
