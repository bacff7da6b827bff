package graft

import graft.operators.GraphMetrics

/** BFS layers (min-hop, depth-capped) and Newman modularity on planted
  * graphs with closed-form answers. */
class BfsModularitySpec extends SparkSpec {
  import spark.implicits._

  test("path graph: layers are hop distances from the smallest node") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val out = GraphMetrics.bfsLayers(e, 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("cycle shortcut: min layer wins") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val out = GraphMetrics.bfsLayers(e, 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("depth cap excludes farther nodes by contract") {
    val e = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val out = GraphMetrics.bfsLayers(e, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L))
  }

  test("sssp: a cheap 2-hop route beats an expensive direct edge") {
    // 1→3 direct costs 10; 1→2→3 costs 2+3=5; 3→4 extends to 8
    val e = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L), (3L, 4L, 3L))
      .toDF("u", "v", "w")
    val out = GraphMetrics.ssspBounded(e, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 2L, 3L -> 5L, 4L -> 8L))
  }

  test("sssp: round bound caps path LENGTH, not weight") {
    // after 1 round only direct neighbors relax: node 3 sees the
    // expensive direct edge (10), not the cheaper 2-edge path (5)
    val e = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L)).toDF("u", "v", "w")
    val one = GraphMetrics.ssspBounded(e, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === Map(1L -> 0L, 2L -> 2L, 3L -> 10L))
    val two = GraphMetrics.ssspBounded(e, 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two(3L) == 5L)
  }

  test("sssp gated instance: distances positive away from the source") {
    val out = GraphMetrics.ssspCoSupply(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val src = out.minBy(_._2)
    assert(src._2 == 0L)
    assert(out.values.count(_ > 0L) > 0)
  }

  test("two clean triangles with matching labels: Q = 1/2 exactly") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("u", "v")
    val lab = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"),
      (6L, "b")).toDF("node", "community")
    val r = GraphMetrics.modularity(e, lab).collect().head
    assert(r.getAs[Long]("m_edges") === 6L)
    assert(r.getAs[Long]("within_edges") === 6L)
    assert(r.getAs[Long]("q_permicro") === 500000L)
  }

  test("one community: Q = 0; perfect anti-community: Q = -1/2") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    val one = Seq((1L, "a"), (2L, "a"), (3L, "a")).toDF("node", "community")
    assert(GraphMetrics.modularity(e, one).collect().head
      .getAs[Long]("q_permicro") === 0L)
    val bip = Seq((1L, 4L), (2L, 5L), (3L, 6L)).toDF("u", "v")
    val lab = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"),
      (6L, "b")).toDF("node", "community")
    assert(GraphMetrics.modularity(bip, lab).collect().head
      .getAs[Long]("q_permicro") === -500000L)
  }

  test("gated instances: well-formed on the sf0.001 co-supply graph") {
    val bfs = GraphMetrics.bfsCoSupply(spark, sfDir).collect()
    assert(bfs.nonEmpty)
    assert(bfs.count(_.getLong(1) === 0L) === 1)
    assert(bfs.forall(r => r.getLong(1) >= 0L && r.getLong(1) <= 6L))
    val q = GraphMetrics.modularityCoSupply(spark, sfDir).collect()
    assert(q.length === 1)
    val qp = q.head.getAs[Long]("q_permicro")
    assert(qp >= -1000000L && qp <= 1000000L)
  }
}
