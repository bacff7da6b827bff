package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphMetrics

class GraphMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) =
    pairs.toDF("u", "v")

  test("triangles: a 4-clique gives every node 3 triangles, a path gives 0") {
    // 4-clique on 1..4 plus a dangling path 4-5-6
    val e = edges((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(4L,5L),(5L,6L))
    val got = GraphMetrics.triangleCounts(e)
      .orderBy("node").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 3L), (2L, 3L, 3L), (3L, 3L, 3L), (4L, 4L, 3L),
      (5L, 2L, 0L), (6L, 1L, 0L)))
  }

  test("label prop: majority wins, count ties break to least label, isolated keeps own") {
    // star: center 1 with neighbors 2,3,4 labeled (7,7,5) -> center takes 7;
    // node 9 isolated keeps its own label 3
    val e = edges((1L,2L),(1L,3L),(1L,4L))
    val nodes = Seq((1L, 9L), (2L, 7L), (3L, 7L), (4L, 5L), (9L, 3L))
      .toDF("node", "label0")
    val got = GraphMetrics.labelPropagationStep(nodes, e)
      .orderBy("node").as[(Long, Long, Long)].collect().toSeq
    // leaves 2,3,4 see only center's label 9
    assert(got === Seq(
      (1L, 9L, 7L), (2L, 7L, 9L), (3L, 7L, 9L), (4L, 5L, 9L), (9L, 3L, 3L)))
    // count tie: neighbors labeled 7 and 5 once each -> least label 5 wins
    val tie = GraphMetrics.labelPropagationStep(
      Seq((1L, 9L), (2L, 7L), (3L, 5L)).toDF("node", "label0"),
      edges((1L,2L),(1L,3L)))
      .filter($"node" === 1L).as[(Long, Long, Long)].head()
    assert(tie === ((1L, 9L, 5L)))
  }

  test("top-K co-supply graph is bounded and symmetric-closed") {
    val e = GraphMetrics.topKCoSupplyEdges(Tables.lineitem(spark, sfDir), 8)
      .cache()
    try {
      val n = e.count()
      assert(n > 0)
      // u < v canonical form, no self loops
      assert(e.filter($"u" >= $"v").isEmpty)
      // degree ≤ 2K by construction
      val maxDeg = e.select($"u".as("n")).unionAll(e.select($"v".as("n")))
        .groupBy("n").count().agg(max("count")).as[Long].head()
      assert(maxDeg <= 16, s"degree bound violated: $maxDeg")
    } finally e.unpersist()
  }

  test("hits: auth1 is in-degree; hand graph scores match") {
    // c1 -> {s1, s2}, c2 -> {s2}
    // auth1: s1=1, s2=2; hub1: c1=3, c2=2; auth2: s1=3, s2=5
    val e = Seq((1L, 101L), (1L, 102L), (2L, 102L)).toDF("c", "s")
    val auth1 = e.groupBy("s").agg(count(lit(1)).as("auth1"))
    val hub1 = e.join(auth1, "s").groupBy("c").agg(sum("auth1").as("hub1"))
    val auth2 = e.join(hub1, "c").groupBy("s").agg(sum("hub1").as("auth2"))
    val got = auth1.join(auth2, "s").orderBy("s")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((101L, 1L, 3L), (102L, 2L, 5L)))
    // and the gated instance runs with one row per trading supplier
    val gated = GraphMetrics.hitsTrade(spark, sfDir)
    assert(gated.count() === gated.select("s_suppkey").distinct().count())
  }
}
