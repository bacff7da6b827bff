package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Mondrian-style k-anonymity REPAIR — the fix half of the audit→fix
  * loop [[KAnonymity]] opens (the reference's export surfaces —
  * /root/reference/DataEngineering/DataBricks/merge_generator.py-shaped
  * curated zones — are where a failed k-audit must be repaired before
  * rows leave). Greedy multidimensional recoding (LeFevre, DeWitt,
  * Ramakrishnan, ICDE'06 "Mondrian Multidimensional K-Anonymity"):
  * recursively median-cut the numeric QI space, allowing a cut only
  * when BOTH sides keep ≥ k rows, then release each leaf partition's
  * QI as its value RANGE [lo, hi] — every released cell carries ≥ k
  * rows by construction, so the export passes the k-audit
  * (spec-asserted by feeding the repaired cells back through
  * [[KAnonymity.audit]]).
  *
  * Determinism (both engines, bit-exact): cut dimensions rotate in a
  * FIXED round-robin order per depth level; the cut point is the exact
  * LOWER MEDIAN — the ⌊(n+1)/2⌋-th smallest value, an order statistic
  * read as max(value | rank ≤ idx) so duplicate values cannot make the
  * rank window's tie order observable; the left/right assignment
  * compares VALUES (≤ median goes left), never ranks. Partition ids
  * evolve as pid' = 2·pid + (right ? 1 : 0) — a stable binary path id.
  *
  * Scale shape: depth D means D window passes partitioned by pid (each
  * one shuffle of the narrow (pid, qi…) projection) + one final
  * aggregate to ≤ 2^D released cells. No collects, no joins; the row
  * count never expands. At 100 TB the QI projection is the only thing
  * shuffled, D times.
  */
object MondrianAnon {

  /** One median-cut round per level over `dims` (rotating round-robin),
    * guarded by k on both sides. Returns the input plus a `__pid` leaf
    * partition id. */
  def assignPartitions(df: DataFrame, dims: Seq[String], k: Long,
                       depth: Int): DataFrame = {
    var cur = df.withColumn("__pid", lit(0L))
    for (level <- 0 until depth) {
      val dim = dims(level % dims.length)
      val w = Window.partitionBy(col("__pid"))
      val wOrd = w.orderBy(col(dim))
      cur = cur
        .withColumn("__n", count(lit(1)).over(w))
        .withColumn("__rn", row_number().over(wOrd))
        // the ⌊(n+1)/2⌋-th smallest value of the cut dim, tie-safe
        .withColumn("__med",
          max(when(expr("__rn <= (__n + 1) div 2"), col(dim))).over(w))
        .withColumn("__leftn",
          sum(when(col(dim) <= col("__med"), 1L).otherwise(0L)).over(w))
        .withColumn("__valid",
          col("__leftn") >= k && (col("__n") - col("__leftn")) >= k)
        .withColumn("__pid", col("__pid") * 2 +
          when(col("__valid") && col(dim) > col("__med"), 1L).otherwise(0L))
        .drop("__n", "__rn", "__med", "__leftn", "__valid")
    }
    cur
  }

  /** Released cells: per leaf partition, each QI dim generalized to its
    * [lo, hi] range + the member count. Every cell has n ≥ k whenever
    * the input has ≥ k rows (cuts are k-guarded). */
  def generalize(df: DataFrame, dims: Seq[String], k: Long,
                 depth: Int): DataFrame = {
    val aggs = dims.flatMap(d =>
      Seq(min(col(d)).as(s"${d}_lo"), max(col(d)).as(s"${d}_hi"))) :+
      count(lit(1)).as("n")
    assignPartitions(df, dims, k, depth)
      .groupBy(col("__pid").as("pid"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("satisfies_k", col("n") >= k)
  }

  // ---- query-map entry (hash-gated) ----

  private val gatedK = 5L
  private val gatedDepth = 4
  private val gatedDims = Seq("bal_cents", "nation")

  /** Gated instance: customers with numeric QI (acctbal cents, nation
    * key), k = 5, depth 4 — ≤ 16 released range-cells. */
  def mondrianCustomer(spark: SparkSession, dir: String): DataFrame =
    generalize(
      Tables.customer(spark, dir).select(
        col("c_nationkey").cast("long").as("nation"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents")),
      gatedDims, gatedK, gatedDepth)

  /** The oracle unrolls the same depth-D loop as nested window selects —
    * GENERATED from the same dims/k/depth constants as the Spark path,
    * so the two cannot de-synchronize. */
  def oracleSql: String = {
    val base =
      """SELECT CAST(c_nationkey AS BIGINT) AS nation,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
        |    CAST(0 AS BIGINT) AS pid
        |  FROM customer""".stripMargin
    val levels = (0 until gatedDepth).map { level =>
      val dim = gatedDims(level % gatedDims.length)
      s"""l${level + 1} AS (
         |  SELECT nation, bal_cents,
         |    pid * 2 + CASE WHEN leftn >= $gatedK AND n - leftn >= $gatedK
         |                        AND $dim > med THEN 1 ELSE 0 END AS pid
         |  FROM (
         |    SELECT *, sum(CASE WHEN $dim <= med THEN 1 ELSE 0 END)
         |        OVER (PARTITION BY pid) AS leftn
         |    FROM (
         |      SELECT *, max(CASE WHEN rn <= (n + 1) // 2 THEN $dim END)
         |          OVER (PARTITION BY pid) AS med
         |      FROM (
         |        SELECT *, count(*) OVER (PARTITION BY pid) AS n,
         |          row_number() OVER (PARTITION BY pid ORDER BY $dim) AS rn
         |        FROM l$level))))""".stripMargin
    }
    val aggCols = gatedDims.flatMap(d =>
      Seq(s"min($d) AS ${d}_lo", s"max($d) AS ${d}_hi")).mkString(",\n  ")
    s"""WITH l0 AS (
       |  $base),
       |${levels.mkString(",\n")}
       |SELECT pid, $aggCols,
       |  CAST(count(*) AS BIGINT) AS n,
       |  count(*) >= $gatedK AS satisfies_k
       |FROM l$gatedDepth GROUP BY pid""".stripMargin
  }
}
