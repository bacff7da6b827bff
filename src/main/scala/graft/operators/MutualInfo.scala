package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Mutual information between two categorical columns — the
  * feature-selection statistic next to [[Contingency]]'s chi-square
  * (chi-square asks "are they independent?"; MI measures HOW MANY NATS
  * of one the other carries), over the same exact cell/margin machinery.
  * Extends the reference's single-column EDA
  * (/root/reference/DataEngineering/Python/discover_schema.py) to
  * column pairs, the screen a feature pipeline runs before encoders.
  *
  * Exactness: every input is an exact BIGINT (cell count, margins,
  * grand total); each cell's MI contribution
  * `(n/N)·ln(n·N/(nₐ·n_b))` is one fixed IEEE expression per OUTPUT
  * row, micros-rounded — `sum(mi_micros)` of the rounded terms is the
  * statistic (BIGINT-associative). Empty cells contribute exactly 0 and
  * are absent by construction (0·ln 0 → 0).
  *
  * Scale: one shuffle to the (a, b) cell grid; margins broadcast —
  * identical envelope to Contingency, scan-bound at any row count.
  */
object MutualInfo {

  /** Per-cell MI decomposition of `aCol` × `bCol`:
    * (a, b, n, mi_micros). */
  def cells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val c = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n"))
    val rowTot = c.groupBy("a").agg(sum("n").as("__na"))
    val colTot = c.groupBy("b").agg(sum("n").as("__nb"))
    val total = c.agg(sum("n").as("__gt"))
    val p = col("n").cast("double") / col("__gt").cast("double")
    val ratio = col("n").cast("double") * col("__gt").cast("double") /
      (col("__na").cast("double") * col("__nb").cast("double"))
    c.join(broadcast(rowTot), "a")
      .join(broadcast(colTot), "b")
      .crossJoin(broadcast(total))
      .withColumn("mi_micros", round(p * log(ratio) * lit(1e6)).cast("long"))
      .select("a", "b", "n", "mi_micros")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: market segment × nation key on customers — a
    * different table and pair than the chi-square gate, same cell
    * machinery under a different statistic. */
  def miCustomer(spark: SparkSession, dir: String): DataFrame =
    cells(Tables.customer(spark, dir), "c_mktsegment", "c_nationkey")
      .withColumnRenamed("a", "segment").withColumnRenamed("b", "nation")

  def oracleSql: String =
    """WITH c AS (
      |  SELECT c_mktsegment AS segment, c_nationkey AS nation,
      |    count(*) AS n
      |  FROM customer GROUP BY 1, 2
      |), ra AS (SELECT segment, CAST(sum(n) AS BIGINT) AS na FROM c GROUP BY 1),
      |rb AS (SELECT nation, CAST(sum(n) AS BIGINT) AS nb FROM c GROUP BY 1),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS gt FROM c)
      |SELECT segment, nation, n,
      |  CAST(round(
      |    CAST(n AS DOUBLE) / gt
      |    * ln(CAST(n AS DOUBLE) * gt / (CAST(na AS DOUBLE) * nb))
      |    * 1e6) AS BIGINT) AS mi_micros
      |FROM c JOIN ra USING (segment) JOIN rb USING (nation)
      |CROSS JOIN tot""".stripMargin
}
