package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Distributed connected components over an edge list — the general
  * graph-clustering primitive behind near-dup cluster collapse
  * ([[graft.dedup.MinHashLsh]] uses the same scheme internally to pick
  * dedup keepers) exposed as a first-class operator: entity resolution,
  * householding, cross-referencing ID spaces, lineage grouping.
  *
  * Algorithm: min-label propagation with pointer jumping. Every round
  * each node takes the least label among itself and its neighbors, then
  * compresses one pointer hop (label := label(label)); a component of
  * diameter D converges in O(log D) rounds. Each round is two shuffle
  * joins keyed on node id over a NARROW (node, label) table with
  * localCheckpoint'ed lineage — at 100 TB the payload is two longs per
  * node regardless of how wide the source rows are, and the convergence
  * check runs every second round to halve driver actions. This is the
  * Spark-native shape of the MapReduce CC algorithms (Kiveris et al.
  * "Connected Components in MapReduce and Beyond" — large-star/small-star
  * have the same O(log D) round structure); GraphX's Pregel loop would
  * pin RDD semantics, while this stays in DataFrame/Catalyst land.
  */
object Graph {

  /** (node, component) for every node in `nodes`, where component is the
    * MINIMUM node id reachable via undirected `edges`. Isolated nodes
    * (no incident edge) are their own component. */
  def connectedComponents(nodes: DataFrame, nodeCol: String,
                          edges: DataFrame, srcCol: String, dstCol: String,
                          maxRounds: Int = 12): DataFrame = {
    val und = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .union(edges.select(col(dstCol).as("__src"), col(srcCol).as("__dst")))
      .localCheckpoint()
    var labels = nodes.select(col(nodeCol).as("__node")).distinct()
      .withColumn("component", col("__node"))
      .localCheckpoint()
    var round = 0
    var converged = und.isEmpty
    while (!converged && round < maxRounds) {
      val neighborMin = und
        .join(labels.withColumnRenamed("__node", "__dst"), "__dst")
        .groupBy(col("__src").as("__node"))
        .agg(min("component").as("__nbr"))
      val propagated = labels.join(neighborMin, Seq("__node"), "left")
        .select(col("__node"),
          least(col("component"), coalesce(col("__nbr"), col("component"))).as("component"))
      val next = propagated.as("x")
        .join(propagated.select(col("__node").as("component"),
            col("component").as("__cc")).as("y"),
          Seq("component"), "left")
        .select(col("__node"),
          least(col("component"), coalesce(col("__cc"), col("component"))).as("component"))
        .localCheckpoint()
      round += 1
      if (round % 2 == 0 || round >= maxRounds)
        converged = next.join(labels.withColumnRenamed("component", "__old"), "__node")
          .filter(col("component") =!= col("__old")).isEmpty
      labels = next
    }
    if (!converged)
      System.err.println(
        s"WARN connectedComponents: not converged in $maxRounds rounds; " +
          "labels may not be component minima")
    labels.select(col("__node").as(nodeCol), col("component"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: the star schema's lineage graph. Nodes are
    * customers, suppliers, nations and regions in disjoint id spaces;
    * edges follow the FKs (customer→nation, supplier→nation,
    * nation→region). Components are exactly the five region "households"
    * and the label is the minimum customer key inside each — a known
    * ground truth the hash gate pins, via a DuckDB recursive-CTE oracle
    * that computes min-reachable-label by transitive closure. */
  def graphComponents(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").as("node"),
        (col("c_nationkey") + 1000000L).as("peer"))
    val supp = Tables.supplier(spark, dir)
      .select((col("s_suppkey") + 3000000L).as("node"),
        (col("s_nationkey") + 1000000L).as("peer"))
    val nat = Tables.nation(spark, dir)
      .select((col("n_nationkey") + 1000000L).as("node"),
        (col("n_regionkey") + 2000000L).as("peer"))
    val edges = cust.unionByName(supp).unionByName(nat)
    val nodes = edges.select(col("node")).union(edges.select(col("peer").as("node")))
    connectedComponents(nodes, "node", edges, "node", "peer")
  }

  def graphComponentsOracleSql: String =
    """WITH edges AS (
      |  SELECT c_custkey AS src, c_nationkey + 1000000 AS dst FROM customer
      |  UNION ALL
      |  SELECT s_suppkey + 3000000, s_nationkey + 1000000 FROM supplier
      |  UNION ALL
      |  SELECT n_nationkey + 1000000, n_regionkey + 2000000 FROM nation
      |), und AS (
      |  SELECT src, dst FROM edges UNION SELECT dst, src FROM edges
      |), nodes AS (
      |  SELECT DISTINCT src AS node FROM und
      |), reach AS (
      |  WITH RECURSIVE r(node, lbl) AS (
      |    SELECT node, node FROM nodes
      |    UNION
      |    SELECT u.dst, r.lbl FROM r JOIN und u ON u.src = r.node
      |  ) SELECT * FROM r
      |)
      |SELECT node, CAST(min(lbl) AS BIGINT) AS component
      |FROM reach GROUP BY node""".stripMargin
}
