package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Isolation-stump anomaly scoring — the isolation-forest principle
  * (anomalies are easier to ISOLATE by random axis-aligned splits)
  * reduced to its one-level exact form: H mixer-deterministic stumps,
  * each choosing a feature and a split uniformly over that feature's
  * observed range; a row scores one point for every stump that puts it
  * on the MINORITY side (few co-residents ⇒ easy to isolate). The
  * multivariate unsupervised companion of [[Hampel]]/[[MadOutliers]]'
  * univariate flags — it catches points that are unremarkable per
  * coordinate but rare in combination. Reference family: the anomaly
  * screens over merge_generator.py-style pipeline metrics.
  *
  * Plan shape — NO row×H explode: the stump parameters are pure
  * functions of h and the 1-row global bounds (broadcast), so the H
  * side counts are H conditional counters inside ONE aggregate pass
  * (map-side combinable), and scoring is a second map-only pass with
  * the counts attached as a broadcast scalar row. Two fact scans
  * total, both whole-stage codegen, at ANY H.
  *
  * Exactness: splits are min_d + mix(961·h) mod (range+1) — exact
  * integers from the shared [[graft.functions.MixMod61]] chain; the
  * minority test compares 2·t_h vs n (division-free); the score is a
  * BIGINT sum of indicator bits. Top-20 report ordered (score DESC,
  * rid ASC) — total order, hash-stable.
  */
object IsolationStumps {

  val H = 16
  val TopK = 20

  /** Top-`TopK` anomalies by stump-isolation score over three integer
    * features: (rid, x1, x2, x3, iso_score, rk). */
  def topAnomalies(df: DataFrame, ridCol: String,
                   f1: String, f2: String, f3: String): DataFrame = {
    val base = df.select(col(ridCol).cast("long").as("rid"),
        col(f1).cast("long").as("x1"), col(f2).cast("long").as("x2"),
        col(f3).cast("long").as("x3"))
      .localCheckpoint() // bounds pass + count pass + scoring pass
    val bounds = base.agg(
      count(lit(1)).as("n"),
      min("x1").as("lo1"), max("x1").as("hi1"),
      min("x2").as("lo2"), max("x2").as("hi2"),
      min("x3").as("lo3"), max("x3").as("hi3"))
    // stump h: dim = 1 + mix(h) mod 3; split = lo_d + mix(961·h) mod
    // (hi_d − lo_d + 1); "left" = x_dim <= split
    def mixExpr(c: org.apache.spark.sql.Column) =
      graft.functions.Native.call("graft_mix_mod61",
        exprs => graft.functions.MixMod61(exprs.head), c)
    def dimOf(h: Int) = pmod(mixExpr(lit(h.toLong)), lit(3L)) + 1
    def splitOf(h: Int) = {
      val d = dimOf(h)
      val lo = when(d === 1, col("lo1")).when(d === 2, col("lo2"))
        .otherwise(col("lo3"))
      val hi = when(d === 1, col("hi1")).when(d === 2, col("hi2"))
        .otherwise(col("hi3"))
      lo + pmod(mixExpr(lit(961L * h)), hi - lo + 1)
    }
    def xOf(h: Int) = {
      val d = dimOf(h)
      when(d === 1, col("x1")).when(d === 2, col("x2")).otherwise(col("x3"))
    }
    // ONE aggregate: H left-side counters
    val counters = (1 to H).map(h =>
      sum(when(xOf(h) <= splitOf(h), 1L).otherwise(0L)).as(s"t$h"))
    val counts = base.crossJoin(broadcast(bounds))
      .agg(counters.head, counters.tail: _*)
    // scoring pass: minority side iff (left ∧ 2t ≤ n) ∨ (right ∧ 2t > n)
    val scoreCol = (1 to H).map { h =>
      when((col(s"x_le_$h") && col(s"t$h") * 2 <= col("n"))
        || (!col(s"x_le_$h") && col(s"t$h") * 2 > col("n")), 1L)
        .otherwise(0L)
    }.reduce(_ + _)
    val withSides = (1 to H).foldLeft(
      base.crossJoin(broadcast(bounds.crossJoin(counts)))) {
      (d, h) => d.withColumn(s"x_le_$h", xOf(h) <= splitOf(h))
    }
    val top = withSides
      .withColumn("iso_score", scoreCol)
      .orderBy(col("iso_score").desc, col("rid").asc)
      .limit(TopK)
    // rank window over the already-limited TopK rows only
    top.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("iso_score").desc, col("rid").asc)).cast("long"))
      .select("rid", "x1", "x2", "x3", "iso_score", "rk")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: lineitem rows rare in (quantity, price,
    * discount) combination. */
  def isoLineitem(spark: SparkSession, dir: String): DataFrame =
    topAnomalies(
      Tables.lineitem(spark, dir).select(
        (col("l_orderkey") * 8 + col("l_linenumber")).as("rid"),
        round(col("l_quantity")).cast("long").as("q"),
        round(col("l_extendedprice")).cast("long").as("p"),
        round(col("l_discount") * 100).cast("long").as("d")),
      "rid", "q", "p", "d")
      .withColumnRenamed("x1", "q").withColumnRenamed("x2", "p")
      .withColumnRenamed("x3", "d")

  def oracleSql: String = {
    import graft.functions.Hll
    def mix(e: String) =
      s"""xor(CAST((CAST(${Hll.A2} AS HUGEINT) * xor(
         |  CAST((CAST(${Hll.A} AS HUGEINT) * ($e) + ${Hll.B}) % ${Hll.P}
         |    AS BIGINT),
         |  CAST((CAST(${Hll.A} AS HUGEINT) * ($e) + ${Hll.B}) % ${Hll.P}
         |    AS BIGINT) >> 30)) % ${Hll.P} AS BIGINT),
         |  CAST((CAST(${Hll.A2} AS HUGEINT) * xor(
         |  CAST((CAST(${Hll.A} AS HUGEINT) * ($e) + ${Hll.B}) % ${Hll.P}
         |    AS BIGINT),
         |  CAST((CAST(${Hll.A} AS HUGEINT) * ($e) + ${Hll.B}) % ${Hll.P}
         |    AS BIGINT) >> 30)) % ${Hll.P} AS BIGINT) >> 27)"""
        .stripMargin.replaceAll("\n", " ")
    val stumps = (1 to H).map { h =>
      s"""SELECT $h AS h, 1 + ${mix(h.toString)} % 3 AS dim,
         |  ${mix((961L * h).toString)} AS srand""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH base AS (
       |  SELECT l_orderkey * 8 + l_linenumber AS rid,
       |    CAST(round(l_quantity) AS BIGINT) AS x1,
       |    CAST(round(l_extendedprice) AS BIGINT) AS x2,
       |    CAST(round(l_discount * 100) AS BIGINT) AS x3
       |  FROM lineitem
       |), bounds AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    min(x1) AS lo1, max(x1) AS hi1, min(x2) AS lo2, max(x2) AS hi2,
       |    min(x3) AS lo3, max(x3) AS hi3
       |  FROM base
       |), stumps0 AS (
       |$stumps
       |), stumps AS (
       |  SELECT h, dim,
       |    CASE dim WHEN 1 THEN lo1 WHEN 2 THEN lo2 ELSE lo3 END
       |      + srand % (CASE dim WHEN 1 THEN hi1 - lo1 WHEN 2 THEN hi2 - lo2
       |                  ELSE hi3 - lo3 END + 1) AS split,
       |    n
       |  FROM stumps0 CROSS JOIN bounds
       |), counts AS (
       |  SELECT s.h, s.dim, s.split, s.n,
       |    CAST(sum(CASE WHEN (CASE s.dim WHEN 1 THEN b.x1 WHEN 2 THEN b.x2
       |                        ELSE b.x3 END) <= s.split
       |             THEN 1 ELSE 0 END) AS BIGINT) AS t
       |  FROM stumps s CROSS JOIN base b
       |  GROUP BY 1, 2, 3, 4
       |), scored AS (
       |  SELECT b.rid, b.x1, b.x2, b.x3,
       |    CAST(sum(CASE WHEN
       |      ((CASE c.dim WHEN 1 THEN b.x1 WHEN 2 THEN b.x2 ELSE b.x3 END)
       |         <= c.split AND 2 * c.t <= c.n)
       |      OR ((CASE c.dim WHEN 1 THEN b.x1 WHEN 2 THEN b.x2 ELSE b.x3 END)
       |         > c.split AND 2 * c.t > c.n)
       |      THEN 1 ELSE 0 END) AS BIGINT) AS iso_score
       |  FROM base b CROSS JOIN counts c
       |  GROUP BY 1, 2, 3, 4
       |)
       |SELECT rid, x1 AS q, x2 AS p, x3 AS d, iso_score,
       |  CAST(row_number() OVER (ORDER BY iso_score DESC, rid ASC)
       |    AS BIGINT) AS rk
       |FROM scored
       |ORDER BY iso_score DESC, rid ASC
       |LIMIT $TopK""".stripMargin
  }
}
