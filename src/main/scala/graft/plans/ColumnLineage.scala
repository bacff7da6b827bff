package graft.plans

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Generate, LeafNode, LogicalPlan, Project, Union, Window}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Column-level lineage extraction from the ANALYZED Catalyst plan —
  * for every output column of a query, which (source table, source
  * column) pairs feed it. This is the impact-analysis primitive the
  * lakehouse governance jobs around the reference's curated layer need
  * (which gold columns break if a bronze column changes type; which
  * outputs carry a PII column — the question [[graft.operators
  * .RtbfCascade]] asks at ROW level, answered here at COLUMN level),
  * computed from the same data structure Catalyst optimizes, so it is
  * correct for any DataFrame the engine can run — no SQL re-parsing.
  *
  * Walk: one `foreachUp` pass (children before parents) propagating
  * exprId → {(table, column)} sets. Leaves seed their own attributes
  * (a parquet relation is named by its root-path basename); Project /
  * Aggregate / Window map each Alias to the union of its referenced
  * attributes' sets — every other node passes attributes through by
  * exprId unchanged (joins, filters, sorts, unions need no casework).
  * Cost is O(plan size); nothing touches data.
  */
object ColumnLineage {

  /** (output column, source table, source column) triples, sorted. */
  def lineage(df: DataFrame): Seq[(String, String, String)] = {
    val memo = mutable.Map.empty[ExprId, Set[(String, String)]]

    def sourcesOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
        : Set[(String, String)] =
      e.references.toSeq.flatMap(a => memo.getOrElse(a.exprId, Set.empty))
        .toSet

    def record(ne: NamedExpression): Unit = ne match {
      case a: Alias => memo(a.exprId) = sourcesOf(a.child)
      case _        => () // bare attribute: exprId already seeded below
    }

    df.queryExecution.analyzed.foreachUp {
      case l: LeafNode =>
        val table = leafName(l)
        l.output.foreach(a => memo(a.exprId) = Set((table, a.name)))
      case p: Project   => p.projectList.foreach(record)
      case a: Aggregate => a.aggregateExpressions.foreach(record)
      case w: Window    => w.windowExpressions.foreach(record)
      case u: Union     =>
        // positional merge: an output column descends from the
        // corresponding column of EVERY branch, not just the first
        u.output.zipWithIndex.foreach { case (out, i) =>
          memo(out.exprId) = u.children
            .flatMap(c => memo.getOrElse(c.output(i).exprId, Set.empty))
            .toSet
        }
      case g: Generate  =>
        // exploded columns descend from the generator's inputs
        g.generatorOutput.foreach(a => memo(a.exprId) = sourcesOf(g.generator))
      case _            => ()
    }
    df.queryExecution.analyzed.output.toSeq.flatMap { a =>
      memo.getOrElse(a.exprId, Set.empty).toSeq
        .map { case (t, c) => (a.name, t, c) }
    }.sorted
  }

  /** Stable name for a leaf: catalog table if registered, else the
    * basename of the file relation's first root path (orders.parquet →
    * orders), else the node's own name. */
  private def leafName(l: LeafNode): String = l match {
    case r: LogicalRelation =>
      r.catalogTable.map(_.identifier.table).getOrElse(r.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.headOption
            .map(_.getName.replaceAll("\\.[A-Za-z0-9]+$", ""))
            .getOrElse(r.nodeName.toLowerCase)
        case _ => r.nodeName.toLowerCase
      })
    case other => other.nodeName.toLowerCase
  }

  /** Lineage as a DataFrame (out_col, src_table, src_col). */
  def lineageDf(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    lineage(df).toDF("out_col", "src_table", "src_col")
      .orderBy("out_col", "src_table", "src_col")
  }

  // ---- query-map entry (hash-gated against a literal oracle) ----

  /** Gated instance: lineage of a representative join+agg+window query
    * — revenue per market segment with a rank column. Pins the walker:
    * aggregates union their inputs, join keys don't leak into outputs,
    * window ordering columns DO count as inputs of the rank. */
  def lineageRevenueQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.{Window => W}
    val o = graft.Tables.orders(spark, dir)
    val c = graft.Tables.customer(spark, dir)
    val q = o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("o_totalprice")).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .withColumn("rev_rank",
        row_number().over(W.orderBy(col("revenue").desc,
          col("c_mktsegment").asc)))
    lineageDf(spark, q)
  }

  def oracleSql: String =
    """SELECT * FROM (VALUES
      |  ('c_mktsegment', 'customer', 'c_mktsegment'),
      |  ('n_orders', 'orders', 'o_orderkey'),
      |  ('rev_rank', 'customer', 'c_mktsegment'),
      |  ('rev_rank', 'orders', 'o_totalprice'),
      |  ('revenue', 'orders', 'o_totalprice')
      |) AS t(out_col, src_table, src_col)""".stripMargin
}
