package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** RANSAC line fit — robust regression by consensus: H deterministic
  * 2-point hypotheses, each scored by how many points sit within a
  * fixed residual tolerance of its line; the winner is the model the
  * LARGEST CONSENSUS SET agrees with, so up to ~half the data can be
  * arbitrarily corrupted without moving the fit (where [[LinReg]]'s
  * least squares chases every outlier and [[HuberStep]] only
  * down-weights them). The sampling-iteration member of the ML-fit
  * primitive gates (kmeans_step, gbt_stump, logreg_newton_step):
  * "random" pairs are the [[graft.functions.MixMod61]] mixer over
  * (row id · 64 + hypothesis) — the bootstrap's replicate-hash
  * discipline — so both engines enumerate identical hypotheses.
  *
  * Exactness: each hypothesis is the line through the two rows with
  * the smallest (mixed priority, rid) per h — two min-STRUCT
  * aggregates (map-side combinable; the oracle's rank-2 window picks
  * the same rows because (priority, rid) is unique). The inlier test
  * is cross-multiplied integer arithmetic — |(y−y1)·dx − (x−x1)·dy| ≤
  * tol·|dx| — no division; vertical pairs (dx = 0) are discarded as
  * degenerate (declared). Winner = max(struct(n_inliers, −h)):
  * consensus first, smallest hypothesis id on ties. Slope reports as
  * the sign-split truncating (10⁶·|dy|) div |dx|; the intercept uses
  * the QUANTIZED slope (quantize-then-propagate).
  *
  * Scale: the priority pass and the scoring pass each stream the fact
  * ×H (H = 16 — the bootstrap-explode envelope); hypotheses broadcast
  * (H rows). Feature-magnitude envelope: |x|,|y| ≤ ~10⁹ keeps every
  * cross-product inside BIGINT at any row count.
  */
object Ransac {

  val H = 16

  /** One row: (h_best, x1, y1, x2, y2, n_inliers, n_total,
    * slope_micros, intercept_micros). */
  def ransacLine(df: DataFrame, ridCol: String, xCol: String, yCol: String,
                 tol: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(ridCol).cast("long").as("rid"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .localCheckpoint() // consumed by the priority AND scoring passes
    val hs = (1 to H).map(_.toLong).toDF("h")
    val pri = base.crossJoin(broadcast(hs))
      .withColumn("pri", graft.functions.Native.call("graft_mix_mod61",
        exprs => graft.functions.MixMod61(exprs.head),
        col("rid") * lit(64L) + col("h")))
    val p1 = pri.groupBy("h")
      .agg(min(struct(col("pri"), col("rid"), col("x"), col("y"))).as("s1"))
      .select(col("h"), col("s1.rid").as("rid1"),
        col("s1.x").as("x1"), col("s1.y").as("y1"))
    val p2 = pri.join(broadcast(p1), Seq("h"))
      .filter(col("rid") =!= col("rid1"))
      .groupBy("h")
      .agg(min(struct(col("pri"), col("rid"), col("x"), col("y"))).as("s2"))
      .select(col("h"), col("s2.x").as("x2"), col("s2.y").as("y2"))
    val hyp = p1.join(p2, Seq("h"))
      .filter(col("x2") =!= col("x1")) // vertical: degenerate, discarded
      .select(col("h"), col("x1"), col("y1"), col("x2"), col("y2"),
        (col("x2") - col("x1")).as("dx"), (col("y2") - col("y1")).as("dy"))
      .localCheckpoint() // broadcast to the scoring pass; tiny
    val scored = base.crossJoin(broadcast(hyp))
      .filter(abs((col("y") - col("y1")) * col("dx")
        - (col("x") - col("x1")) * col("dy")) <= lit(tol) * abs(col("dx")))
      .groupBy("h", "x1", "y1", "x2", "y2", "dx", "dy")
      .agg(count(lit(1)).as("n_inliers"))
    val nTotal = base.count()
    scored
      .agg(max(struct(col("n_inliers"), (-col("h")).as("negh"), col("x1"),
        col("y1"), col("x2"), col("y2"), col("dx"), col("dy"))).as("w"))
      .select((-col("w.negh")).as("h_best"),
        col("w.x1").as("x1"), col("w.y1").as("y1"),
        col("w.x2").as("x2"), col("w.y2").as("y2"),
        col("w.n_inliers").as("n_inliers"),
        lit(nTotal).as("n_total"),
        expr("""(CASE WHEN w.dy < 0 THEN -1L ELSE 1L END)
                * (CASE WHEN w.dx < 0 THEN -1L ELSE 1L END)
                * ((1000000 * abs(w.dy)) div abs(w.dx))""").as("slope_micros"))
      .withColumn("intercept_micros",
        col("y1") * lit(1000000L) - col("slope_micros") * col("x1"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: consensus line of extendedprice (whole dollars)
    * on quantity over lineitem, tol = $10,000. */
  def ransacLineitem(spark: SparkSession, dir: String): DataFrame =
    ransacLine(
      Tables.lineitem(spark, dir).select(
        (col("l_orderkey") * 8 + col("l_linenumber")).as("rid"),
        round(col("l_quantity")).cast("long").as("q"),
        round(col("l_extendedprice")).cast("long").as("p")),
      "rid", "q", "p", tol = 10000L)

  def oracleSql: String = {
    import graft.functions.Hll
    s"""WITH base AS (
       |  SELECT l_orderkey * 8 + l_linenumber AS rid,
       |    CAST(round(l_quantity) AS BIGINT) AS x,
       |    CAST(round(l_extendedprice) AS BIGINT) AS y
       |  FROM lineitem
       |), pri AS (
       |  SELECT rid, x, y, h,
       |    CAST(xor(h2, h2 >> 27) AS BIGINT) AS pri
       |  FROM (
       |    SELECT rid, x, y, h,
       |      CAST((CAST(${Hll.A2} AS HUGEINT) * xor(h1, h1 >> 30)) % ${Hll.P}
       |        AS BIGINT) AS h2
       |    FROM (
       |      SELECT rid, x, y, h,
       |        CAST((CAST(${Hll.A} AS HUGEINT) * (rid * 64 + h) + ${Hll.B})
       |          % ${Hll.P} AS BIGINT) AS h1
       |      FROM base CROSS JOIN (SELECT unnest(range(1, ${H + 1})) AS h)))
       |), ranked AS (
       |  SELECT h, x, y,
       |    row_number() OVER (PARTITION BY h ORDER BY pri, rid) AS rk
       |  FROM pri
       |), hyp AS (
       |  SELECT h,
       |    max(CASE WHEN rk = 1 THEN x END) AS x1,
       |    max(CASE WHEN rk = 1 THEN y END) AS y1,
       |    max(CASE WHEN rk = 2 THEN x END) AS x2,
       |    max(CASE WHEN rk = 2 THEN y END) AS y2
       |  FROM ranked WHERE rk <= 2 GROUP BY h
       |  HAVING max(CASE WHEN rk = 2 THEN x END)
       |       <> max(CASE WHEN rk = 1 THEN x END)
       |), counted AS (
       |  SELECT hyp.h, hyp.x1, hyp.y1, hyp.x2, hyp.y2,
       |    hyp.x2 - hyp.x1 AS dx, hyp.y2 - hyp.y1 AS dy,
       |    CAST(count(*) AS BIGINT) AS n_inliers
       |  FROM hyp JOIN base b
       |    ON abs((b.y - hyp.y1) * (hyp.x2 - hyp.x1)
       |           - (b.x - hyp.x1) * (hyp.y2 - hyp.y1))
       |       <= 10000 * abs(hyp.x2 - hyp.x1)
       |  GROUP BY 1, 2, 3, 4, 5
       |), best AS (
       |  SELECT *, row_number() OVER (ORDER BY n_inliers DESC, h ASC) AS r
       |  FROM counted
       |)
       |SELECT CAST(h AS BIGINT) AS h_best, x1, y1, x2, y2, n_inliers,
       |  (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_total,
       |  (CASE WHEN dy < 0 THEN -1 ELSE 1 END)
       |    * (CASE WHEN dx < 0 THEN -1 ELSE 1 END)
       |    * ((1000000 * abs(dy)) // abs(dx)) AS slope_micros,
       |  y1 * 1000000 + (CASE WHEN dy < 0 THEN -1 ELSE 1 END)
       |    * (CASE WHEN dx < 0 THEN -1 ELSE 1 END)
       |    * ((1000000 * abs(dy)) // abs(dx)) * (-x1) AS intercept_micros
       |FROM best WHERE r = 1""".stripMargin
  }
}
