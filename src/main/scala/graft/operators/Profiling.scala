package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Schema-constraint discovery over raw tables — the profiling pass a
  * lakehouse onboarding runs BEFORE trusting joins and MERGE keys
  * (the reference hand-declares these constraints all over
  * merge_generator.py's key columns and spark_read_sql.py's join
  * graphs; this operator DISCOVERS them): functional dependencies
  * (does A determine B?) and inclusion dependencies (is A a foreign
  * key into B?). Complements [[DataQuality]] (per-column stats) and
  * [[OpsAudit.fkOrphans]] (verification of a DECLARED key) with the
  * discovery side.
  *
  * Scale shape: each FD candidate is one groupBy on its LHS (map-side
  * combined counts, uniform keys); each IND candidate is one
  * distinct-project per side plus a left-anti join on the value —
  * distincts collapse the fact volume FIRST, so the join moves
  * vocabulary-sized sets. Candidates are a declared bounded list, not
  * the O(cols²) cross product — at 100 TB you run the lattice search
  * on a sample and verify survivors exactly, which is this operator.
  */
object Profiling {

  /** One FD-candidate verdict per declared (name, lhs cols, rhs col):
    * (dep, n_lhs, n_violating, max_rhs_per_lhs, holds). Composite LHS
    * is the tuple of columns. */
  def fdDiscover(cands: Seq[(String, DataFrame, Seq[String], String)]): DataFrame =
    cands.map { case (name, df, lhs, rhs) =>
      df.groupBy(lhs.map(col): _*)
        .agg(countDistinct(col(rhs)).as("nd"))
        .agg(
          count(lit(1)).as("n_lhs"),
          sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_violating"),
          max("nd").as("max_rhs_per_lhs"))
        .select(lit(name).as("dep"), col("n_lhs"), col("n_violating"),
          col("max_rhs_per_lhs"),
          (col("n_violating") === 0L).as("holds"))
    }.reduce(_ unionByName _)

  /** One IND-candidate verdict per declared (name, lhs side, rhs side):
    * (dep, n_distinct_lhs, n_missing, contained). NULL LHS values are
    * ignored (SQL FK semantics). */
  def indDiscover(cands: Seq[(String, DataFrame, DataFrame)]): DataFrame =
    cands.map { case (name, lhs, rhs) =>
      val l = lhs.toDF("v").filter(col("v").isNotNull).distinct()
      val r = rhs.toDF("v").filter(col("v").isNotNull).distinct()
      val miss = l.join(r, Seq("v"), "left_anti")
        .agg(count(lit(1)).as("n_missing"))
      l.agg(count(lit(1)).as("n_distinct_lhs"))
        .crossJoin(miss)
        .select(lit(name).as("dep"), col("n_distinct_lhs"),
          col("n_missing"), (col("n_missing") === 0L).as("contained"))
    }.reduce(_ unionByName _)

  // ---- query-map entries (hash-gated) ----

  /** Gated FD sweep: a mix of holding keys (o_orderkey→o_custkey,
    * p_partkey→p_brand) and failing candidates (priority per customer,
    * brand per size — and the TPC-H composite lineitem PK, which the
    * sweep reveals the SYNTHETIC generator does not enforce: exactly
    * the discovery this operator exists for). The output pins BOTH
    * directions of the verdict. */
  def fdOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val c = Tables.customer(spark, dir)
    val p = Tables.part(spark, dir)
    fdDiscover(Seq(
      ("o_orderkey->o_custkey", o, Seq("o_orderkey"), "o_custkey"),
      ("o_custkey->o_orderpriority", o, Seq("o_custkey"), "o_orderpriority"),
      ("l_orderkey,l_linenumber->l_partkey", l,
        Seq("l_orderkey", "l_linenumber"), "l_partkey"),
      ("l_orderkey->l_suppkey", l, Seq("l_orderkey"), "l_suppkey"),
      ("c_nationkey->c_mktsegment", c, Seq("c_nationkey"), "c_mktsegment"),
      ("p_partkey->p_brand", p, Seq("p_partkey"), "p_brand"),
      ("p_size->p_brand", p, Seq("p_size"), "p_brand")))
  }

  def fdOracleSql: String = {
    def one(name: String, table: String, lhs: String, rhs: String) =
      s"""SELECT '$name' AS dep, CAST(count(*) AS BIGINT) AS n_lhs,
         |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_violating,
         |  CAST(max(nd) AS BIGINT) AS max_rhs_per_lhs,
         |  sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
         |FROM (SELECT $lhs, count(DISTINCT $rhs) AS nd
         |      FROM $table GROUP BY $lhs)""".stripMargin
    Seq(
      one("o_orderkey->o_custkey", "orders", "o_orderkey", "o_custkey"),
      one("o_custkey->o_orderpriority", "orders", "o_custkey",
        "o_orderpriority"),
      one("l_orderkey,l_linenumber->l_partkey", "lineitem",
        "l_orderkey, l_linenumber", "l_partkey"),
      one("l_orderkey->l_suppkey", "lineitem", "l_orderkey", "l_suppkey"),
      one("c_nationkey->c_mktsegment", "customer", "c_nationkey",
        "c_mktsegment"),
      one("p_partkey->p_brand", "part", "p_partkey", "p_brand"),
      one("p_size->p_brand", "part", "p_size", "p_brand")
    ).mkString("", "\nUNION ALL\n", "")
  }

  /** Gated IND sweep: the real FK edges of the star schema plus one
    * deliberately false candidate and one empirical direction (are all
    * parts actually ordered?). */
  def indOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val c = Tables.customer(spark, dir)
    val p = Tables.part(spark, dir)
    val n = Tables.nation(spark, dir)
    indDiscover(Seq(
      ("l_orderkey<=o_orderkey", l.select("l_orderkey"),
        o.select("o_orderkey")),
      ("o_custkey<=c_custkey", o.select("o_custkey"),
        c.select("c_custkey")),
      ("c_nationkey<=n_nationkey", c.select("c_nationkey"),
        n.select("n_nationkey")),
      ("l_partkey<=p_partkey", l.select("l_partkey"),
        p.select("p_partkey")),
      ("p_partkey<=l_partkey", p.select("p_partkey"),
        l.select("l_partkey")),
      ("o_orderkey<=c_custkey", o.select("o_orderkey"),
        c.select("c_custkey"))))
  }

  def indOracleSql: String = {
    def one(name: String, lt: String, lc: String, rt: String, rc: String) =
      s"""SELECT '$name' AS dep,
         |  CAST((SELECT count(DISTINCT $lc) FROM $lt
         |        WHERE $lc IS NOT NULL) AS BIGINT) AS n_distinct_lhs,
         |  CAST((SELECT count(*) FROM
         |         (SELECT DISTINCT $lc AS v FROM $lt WHERE $lc IS NOT NULL)
         |        WHERE v NOT IN (SELECT $rc FROM $rt WHERE $rc IS NOT NULL))
         |    AS BIGINT) AS n_missing,
         |  (SELECT count(*) FROM
         |     (SELECT DISTINCT $lc AS v FROM $lt WHERE $lc IS NOT NULL)
         |   WHERE v NOT IN (SELECT $rc FROM $rt WHERE $rc IS NOT NULL)) = 0
         |    AS contained""".stripMargin
    Seq(
      one("l_orderkey<=o_orderkey", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      one("o_custkey<=c_custkey", "orders", "o_custkey",
        "customer", "c_custkey"),
      one("c_nationkey<=n_nationkey", "customer", "c_nationkey",
        "nation", "n_nationkey"),
      one("l_partkey<=p_partkey", "lineitem", "l_partkey",
        "part", "p_partkey"),
      one("p_partkey<=l_partkey", "part", "p_partkey",
        "lineitem", "l_partkey"),
      one("o_orderkey<=c_custkey", "orders", "o_orderkey",
        "customer", "c_custkey")
    ).mkString("", "\nUNION ALL\n", "")
  }
}
