package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** BOM (bill-of-materials) quantity explosion over a parent-child DAG —
  * the part of /root/reference/DataEngineering/Python/
  * parent_child_recursion.py that [[Hierarchy]] does NOT cover: its
  * `nextExtras` machinery re-walks a child once PER OCCURRENCE under
  * its parents (duplicated children multiply downstream), i.e. the
  * total requirement of a node is the SUM over all root→node paths of
  * the PRODUCT of edge quantities along each path.
  *
  * Level-synchronous form: the frontier carries per-(root, node)
  * MERGED (qty, n_paths) sums at each depth; expanding a merged row
  * through an edge multiplies the whole path bundle at once, so
  * equal-depth diamonds cost one traversal where the reference's pandas
  * recursion re-walks each occurrence. Unequal-depth re-arrivals are
  * re-expanded per depth — the same contract as the reference (and any
  * per-path semantics), bounded by `maxDepth`. Each level is one
  * distributed join + one (root, node) aggregate, localCheckpoint'ed
  * (O(1) lineage, the [[Hierarchy]] discipline); loop count = DAG
  * depth, never row count.
  *
  * Quantities are exact BIGINT products/sums; callers keep
  * qty^depth inside 2^63 (real BOMs are shallow).
  */
object BomExplode {

  /** Explode `edges` (parentCol, childCol, qtyCol) from the `roots`
    * frame (single column = the root node ids): per (root_key, node)
    * the path count and total required quantity, roots included at
    * qty 1. */
  def explode(edges: DataFrame, parentCol: String, childCol: String,
              qtyCol: String, roots: DataFrame,
              maxDepth: Int = 20): DataFrame = {
    val e = edges.select(col(parentCol).cast("long").as("__p"),
      col(childCol).cast("long").as("__c"),
      col(qtyCol).cast("long").as("__q")).localCheckpoint()
    var frontier = roots.select(roots.columns.head)
      .select(col(roots.columns.head).cast("long").as("node"))
      .select(col("node").as("root_key"), col("node"),
        lit(1L).as("qty"), lit(1L).as("n_paths"))
      .localCheckpoint()
    val levels = scala.collection.mutable.ArrayBuffer(frontier)
    var level = 0
    var more = !frontier.isEmpty
    while (more && level < maxDepth) {
      frontier = e.join(frontier.withColumnRenamed("node", "__pn"),
          col("__p") === col("__pn"))
        .groupBy(col("root_key"), col("__c").as("node"))
        .agg(sum(col("qty") * col("__q")).as("qty"),
          sum(col("n_paths")).as("n_paths"))
        .localCheckpoint()
      if (frontier.isEmpty) more = false
      else { levels += frontier; level += 1 }
    }
    levels.reduce(_ unionByName _)
      .groupBy(col("root_key"), col("node"))
      .agg(sum(col("n_paths")).as("n_paths"),
        sum(col("qty")).as("total_qty"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: a deterministic multi-parent DAG over customer
    * keys — e1: parent = key div 10 (qty = key mod 3 + 1) for keys ≥
    * 10, e2: parent = key div 7 (qty 2) for keys ≥ 49 (provably
    * distinct from e1's parent there, so those nodes have TWO parents
    * and their subtrees carry real multi-path sums); roots = keys
    * < 10. Acyclic: both parents are strictly smaller. */
  def bomExplodeCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey").cast("long").as("k"))
    val e1 = c.filter(col("k") >= 10).select(
      expr("k div 10").as("parent"), col("k").as("child"),
      (pmod(col("k"), lit(3)) + 1).cast("long").as("qty"))
    val e2 = c.filter(col("k") >= 49).select(
      expr("k div 7").as("parent"), col("k").as("child"),
      lit(2L).as("qty"))
    BomExplode.explode(e1.unionByName(e2), "parent", "child", "qty",
      c.filter(col("k") < 10))
  }

  def oracleSql: String =
    """WITH RECURSIVE edges AS (
      |  SELECT c_custkey // 10 AS parent, c_custkey AS child,
      |    c_custkey % 3 + 1 AS qty
      |  FROM customer WHERE c_custkey >= 10
      |  UNION ALL
      |  SELECT c_custkey // 7, c_custkey, 2
      |  FROM customer WHERE c_custkey >= 49),
      |walk AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS root_key,
      |    CAST(c_custkey AS BIGINT) AS node,
      |    CAST(1 AS BIGINT) AS qty, CAST(1 AS BIGINT) AS n_paths,
      |    0 AS depth
      |  FROM customer WHERE c_custkey < 10
      |  UNION ALL
      |  SELECT w.root_key, CAST(e.child AS BIGINT),
      |    w.qty * e.qty, w.n_paths, w.depth + 1
      |  FROM walk w JOIN edges e ON e.parent = w.node
      |  WHERE w.depth < 20)
      |SELECT root_key, node,
      |  CAST(sum(n_paths) AS BIGINT) AS n_paths,
      |  CAST(sum(qty) AS BIGINT) AS total_qty
      |FROM walk GROUP BY root_key, node""".stripMargin
}
