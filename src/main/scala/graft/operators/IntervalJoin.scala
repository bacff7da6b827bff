package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Interval-OVERLAP join — the two-sided generalization of
  * [[RangeJoin]] (point-in-interval) and the join behind every
  * "what was in flight during this window" question (the reference's
  * repair-overlap analyses join maintenance windows against in-transit
  * spans around /root/reference/MachineLearning/Ray/recsys/
  * generate_data.py's chained-repair sequences).
  *
  * A naive overlap join is a cross product with a filter — quadratic
  * and unshardable. The scalable form tiles time into fixed-width
  * buckets: each interval explodes to the buckets it covers (cost
  * Σ length/W, linear), the join runs on the bucket as an EQUI key
  * (plus any caller equi keys), and a pair that co-occurs in several
  * buckets is kept exactly once by the FIRST-OVERLAP-BUCKET rule —
  * the surviving copy is the one in bucket(max(start_l, start_r)),
  * which both intervals provably cover, so no distinct/shuffle-dedup
  * is ever needed. Shuffle volume = exploded size, never the cross
  * product; `bucketDays` trades explode factor against per-bucket
  * join fan-in (pick ≈ median interval length).
  *
  * Scale: both sides shuffle once on (equiKeys, bucket); AQE handles
  * hot calendar buckets. Output is pair-shaped — aggregate downstream
  * (as the gated instance does) to keep results bounded.
  */
object IntervalJoin {

  /** All-pairs overlap join of `left` and `right` (closed intervals of
    * DATE columns; column names must be disjoint across sides): rows =
    * left ++ right columns for every pair with
    * max(lStart, rStart) ≤ min(lEnd, rEnd) and equal `equiKeys`.
    * Intervals with end < start are dropped (empty). */
  def overlapPairs(left: DataFrame, right: DataFrame,
                   lStart: String, lEnd: String,
                   rStart: String, rEnd: String,
                   equiKeys: Seq[(String, String)] = Nil,
                   bucketDays: Int = 32): DataFrame = {
    require(bucketDays > 0)
    def buckets(df: DataFrame, s: String, e: String, p: String): DataFrame =
      df.filter(col(e) >= col(s))
        .withColumn(s"${p}b0",
          expr(s"datediff($s, DATE'1970-01-01') div $bucketDays"))
        .withColumn(s"${p}bkt", explode(sequence(col(s"${p}b0"),
          expr(s"datediff($e, DATE'1970-01-01') div $bucketDays"))))
    val l = buckets(left, lStart, lEnd, "__l")
    val r = buckets(right, rStart, rEnd, "__r")
    val eq = equiKeys.map { case (a, b) => l(a) === r(b) }
      .foldLeft(col("__lbkt") === col("__rbkt"))(_ && _)
    l.join(r, eq &&
        col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__lbkt") === greatest(col("__lb0"), col("__rb0")))
      .drop("__lb0", "__lbkt", "__rb0", "__rbkt")
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: 14-day supplier maintenance windows (start =
    * 1995-01-01 + suppkey·24 mod 2400 — deterministic, spread over the
    * calendar) overlap-joined ON THE SUPPLIER KEY against that
    * supplier's own order fulfillment spans [o_orderdate, l_shipdate]:
    * per supplier the count and total overlap days of ITS shipments in
    * flight during ITS window. The equi key keeps pair volume linear
    * in the fact at any SF (an UNKEYED corpus×corpus overlap join
    * inherently produces |matches| ∝ L·R·selectivity pairs — ask it
    * only of bounded interval sets; the spec covers that path). Inner
    * semantics: windows overlapping nothing are absent. */
  def maintenanceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val win = Tables.supplier(spark, dir).select(
      col("s_suppkey"),
      expr("date_add(DATE'1995-01-01', CAST((s_suppkey * 24) % 2400 AS INT))")
        .as("w_start"))
      .withColumn("w_end", date_add(col("w_start"), 13))
    val span = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"),
        to_date(col("o_orderdate")).as("f_start"),
        to_date(col("l_shipdate")).as("f_end"))
    overlapPairs(win, span, "w_start", "w_end", "f_start", "f_end",
        equiKeys = Seq("s_suppkey" -> "l_suppkey"))
      .groupBy("s_suppkey")
      .agg(count(lit(1)).as("n_in_flight"),
        sum(datediff(least(col("w_end"), col("f_end")),
          greatest(col("w_start"), col("f_start"))) + 1).as("overlap_days"))
  }

  def oracleSql: String =
    """WITH win AS (
      |  SELECT s_suppkey,
      |    DATE '1995-01-01' + CAST((s_suppkey * 24) % 2400 AS INT) AS w_start,
      |    DATE '1995-01-01' + CAST((s_suppkey * 24) % 2400 AS INT) + 13 AS w_end
      |  FROM supplier),
      |span AS (
      |  SELECT l.l_suppkey, CAST(o.o_orderdate AS DATE) AS f_start,
      |    CAST(l.l_shipdate AS DATE) AS f_end
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  WHERE CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE))
      |SELECT w.s_suppkey, count(*) AS n_in_flight,
      |  CAST(sum(CAST(least(w.w_end, s.f_end) - greatest(w.w_start, s.f_start) AS BIGINT) + 1) AS BIGINT) AS overlap_days
      |FROM win w JOIN span s
      |  ON s.l_suppkey = w.s_suppkey
      |  AND w.w_start <= s.f_end AND s.f_start <= w.w_end
      |GROUP BY w.s_suppkey""".stripMargin
}
