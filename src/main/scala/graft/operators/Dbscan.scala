package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** DBSCAN core/border/noise classification over 2-D integer points —
  * the density-clustering primitive beside [[graft.ann.KnnClassify]]'s
  * label transfer and kmeans_step's Lloyd pass: which points sit inside
  * an ε-dense region (core), hang off one (border), or are outliers
  * (noise)? The outlier-screening pass before training-set curation
  * (/root/reference/MachineLearning/Ray performant_faiss.py family's
  * vector hygiene).
  *
  * Candidate generation is GRID-BUCKETED, the LSH pattern: quantize to
  * ε-side cells with FLOOR division (x − pmod(x, ε)) div ε so negative
  * coordinates land in the right cell, explode each point to its 3×3
  * neighbor cells map-side, and equi-join on the cell key — every true
  * ε-pair shares an exploded cell, so the exact distance filter over
  * candidates is EXACT DBSCAN, no recall caveat. Distances are squared
  * L2 in BIGINT milli — no sqrt, no float. The pair frame is
  * materialized once and consumed by both the count pass (coreness)
  * and the core-neighbor pass (border rescue).
  *
  * Scale: work per cell is |cell|² — linear while density per ε-cell is
  * bounded (the 100 TB stance: ε chosen for the data's density). A
  * replica sweep that DENSIFIES a fixed region at fixed ε is
  * superlinear BY CONSTRUCTION (neighborhoods grow with N) — declared,
  * the dedup_embedding_exhaustive precedent.
  */
object Dbscan {

  /** Per-point (id, n_neighbors, cls ∈ core|border|noise). |N_ε(p)|
    * includes p itself (the original DBSCAN convention). */
  def classify(points: DataFrame, idCol: String, xCol: String, yCol: String,
               epsMilli: Long, minPts: Long): DataFrame = {
    val eps2 = epsMilli * epsMilli
    val p = points.select(col(idCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    def cellOf(c: String) = expr(s"($c - pmod($c, $epsMilli)) div $epsMilli")
    val offsets = Seq(-1L, 0L, 1L)
    val probe = p.select(col("id"), col("x"), col("y"),
        cellOf("x").as("cx"), cellOf("y").as("cy"))
      .withColumn("dx", explode(array(offsets.map(lit): _*)))
      .withColumn("dy", explode(array(offsets.map(lit): _*)))
      .select(col("id"), col("x"), col("y"),
        (col("cx") + col("dx")).as("jx"), (col("cy") + col("dy")).as("jy"))
    val build = p.select(col("id").as("b_id"), col("x").as("bx"),
      col("y").as("by"), cellOf("x").as("jx"), cellOf("y").as("jy"))
    // every true ε-pair shares the exploded cell; exact filter after
    val pairs = probe.join(build, Seq("jx", "jy"))
      .filter((col("x") - col("bx")) * (col("x") - col("bx"))
        + (col("y") - col("by")) * (col("y") - col("by")) <= eps2)
      .select(col("id"), col("b_id"))
      .localCheckpoint() // consumed by the count pass AND the border pass
    val counts = pairs.groupBy(col("id"))
      .agg(count(lit(1)).as("n_neighbors"))
      .withColumn("is_core", col("n_neighbors") >= minPts)
    val coreFlags = counts.select(col("id").as("b_id"),
      col("is_core").as("b_core"))
    val rescued = pairs.filter(col("id") =!= col("b_id"))
      .join(coreFlags, "b_id")
      .groupBy(col("id")).agg(max(col("b_core")).as("has_core_neighbor"))
    counts.join(rescued, Seq("id"), "left")
      .select(col("id"), col("n_neighbors"),
        when(col("is_core"), lit("core"))
          .when(coalesce(col("has_core_neighbor"), lit(false)), lit("border"))
          .otherwise(lit("noise")).as("cls"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: milli-quantized first two embedding dimensions,
    * ε = 60 milli, minPts = 8 — the 2-D projection screen. */
  def dbscanEmbeddings(spark: SparkSession, dir: String): DataFrame =
    classify(
      Tables.embeddings(spark, dir).select(col("vec_id"),
        round(element_at(col("embedding"), 1) * 1000).cast("long").as("x"),
        round(element_at(col("embedding"), 2) * 1000).cast("long").as("y")),
      "vec_id", "x", "y", epsMilli = 60L, minPts = 8L)

  def oracleSql: String =
    """WITH p AS (
      |  SELECT vec_id AS id,
      |    CAST(round(embedding[1] * 1000) AS BIGINT) AS x,
      |    CAST(round(embedding[2] * 1000) AS BIGINT) AS y
      |  FROM embeddings
      |), cells AS (
      |  SELECT id, x, y,
      |    (x - ((x % 60) + 60) % 60) // 60 AS cx,
      |    (y - ((y % 60) + 60) % 60) // 60 AS cy
      |  FROM p
      |), probe AS (
      |  SELECT c.id, c.x, c.y, c.cx + dx.d AS jx, c.cy + dy.d AS jy
      |  FROM cells c
      |  CROSS JOIN (VALUES (-1), (0), (1)) dx(d)
      |  CROSS JOIN (VALUES (-1), (0), (1)) dy(d)
      |), pairs AS (
      |  SELECT a.id, b.id AS b_id
      |  FROM probe a JOIN cells b ON a.jx = b.cx AND a.jy = b.cy
      |  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 3600
      |), counts AS (
      |  SELECT id, count(*) AS n_neighbors,
      |    count(*) >= 8 AS is_core
      |  FROM pairs GROUP BY 1
      |), rescued AS (
      |  SELECT pr.id, max(c.is_core) AS has_core_neighbor
      |  FROM pairs pr JOIN counts c ON pr.b_id = c.id
      |  WHERE pr.id <> pr.b_id
      |  GROUP BY 1
      |)
      |SELECT c.id, c.n_neighbors,
      |  CASE WHEN c.is_core THEN 'core'
      |       WHEN coalesce(r.has_core_neighbor, false) THEN 'border'
      |       ELSE 'noise' END AS cls
      |FROM counts c LEFT JOIN rescued r ON c.id = r.id""".stripMargin
}
