package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.{dotQ, quantize}

/** One DISTRIBUTED Lloyd iteration (assign every point to its nearest
  * centroid, recompute centroid means) in exact integer arithmetic —
  * the corpus-side k-means primitive behind IVF/PQ codebook training
  * (/root/reference/MachineLearning/ML/performant_faiss.py trains
  * `IVF65536,PQ8x8`), pulled into relational form so a DuckDB hash
  * gate pins it — the same move `gbt_stump` makes for the tree-fit
  * iteration. [[Kmeans]] deliberately fits on a bounded driver-side
  * sample (the FAISS shape); what runs DISTRIBUTED at 100 TB is
  * exactly this step — assignment of the full corpus plus a mean
  * update — and that is the machinery gated here.
  *
  * Exactness: coordinates quantized to integer millis
  * (floor(x·1000), [[graft.functions.QuantizeVec]]); distances via the
  * expansion ‖p‖² + ‖c‖² − 2·p·c with the codegen'd integer
  * [[graft.functions.LongArrayDot]] — no float ever enters, so argmin
  * and means are bit-stable across engines, runs, and partitionings.
  * Ties go to the lower centroid id; means use truncating integer
  * division (identical in Spark `div` and DuckDB `//`, negatives
  * included). Empty centroids emit no rows on either engine.
  *
  * Scale shape: centroids (k rows) broadcast — the N×k assignment
  * score is the irreducible cost of a Lloyd pass; the argmin is a
  * per-point window (one shuffle on point id), and the mean update
  * aggregates k·d bounded rows. No corpus-sized state anywhere.
  */
object KmeansStep {

  /** One iteration against EXPLICIT centroids `(centroid: long,
    * cvec: array<bigint>)` in milli-quantized space — the library form
    * callers iterate. Output long-form: (centroid, dim, n_assigned,
    * sum_milli, mean_milli). */
  def stepFrom(points: DataFrame, idCol: String, vecCol: String,
               centroids: DataFrame): DataFrame = {
    val pts = points.select(col(idCol).cast("long").as("__id"),
        quantize(col(vecCol)).as("__e"))
      .withColumn("__nrm", dotQ(col("__e"), col("__e")))
    val cents = centroids
      .select(col("centroid").as("__cid"), col("cvec").as("__c"))
      .withColumn("__cnrm", dotQ(col("__c"), col("__c")))
    val assigned = pts.crossJoin(broadcast(cents))
      .withColumn("__d2",
        col("__nrm") + col("__cnrm") - lit(2L) * dotQ(col("__e"), col("__c")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__id").orderBy(col("__d2"), col("__cid"))))
      .filter(col("__rn") === 1)
    assigned.select(col("__cid"), posexplode(col("__e")).as(Seq("__dim", "__v")))
      .groupBy(col("__cid").as("centroid"), col("__dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_assigned"), sum("__v").as("sum_milli"))
      .withColumn("mean_milli", expr("sum_milli div n_assigned"))
      .select("centroid", "dim", "n_assigned", "sum_milli", "mean_milli")
  }

  /** One iteration from planted seeds (the k lowest `idCol` rows —
    * deterministic, shared with the oracle). */
  def step(points: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val seeds = points.select(col(idCol).cast("long").as("centroid"),
        quantize(col(vecCol)).as("cvec"))
      .filter(col("centroid") < k)
    stepFrom(points, idCol, vecCol, seeds)
  }

  /** Fold a step's long-form means back into `(centroid, cvec)` — the
    * feedback edge of the Lloyd loop. k·d rows: bounded. */
  def meansAsCentroids(stepOut: DataFrame): DataFrame =
    stepOut.groupBy("centroid")
      .agg(expr("transform(sort_array(collect_list(struct(dim, mean_milli)))," +
        " x -> x.mean_milli)").as("cvec"))

  /** `iters` full Lloyd iterations from the planted seeds; returns the
    * final long-form step output. Each round's k·d centroid frame is
    * localCheckpoint'ed so the plan stays one-iteration deep no matter
    * how many rounds run (the corpus is re-scanned per round — the
    * irreducible k-means access pattern). */
  def iterate(points: DataFrame, idCol: String, vecCol: String,
              k: Int, iters: Int): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    var out = step(points, idCol, vecCol, k)
    for (_ <- 2 to iters)
      out = stepFrom(points, idCol, vecCol,
        meansAsCentroids(out).localCheckpoint())
    out
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: k = 8 seeded from vec_id 0..7 over the embeddings
    * corpus. */
  def kmeansStepEmbeddings(spark: SparkSession, dir: String): DataFrame =
    step(Tables.embeddings(spark, dir), "vec_id", "embedding", k = 8)

  /** Quantized-corpus + seed-centroid CTEs shared by both gated
    * iterations. */
  private[graft] val baseCtes: String =
    """e AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS em
      |  FROM embeddings
      |), n AS (
      |  SELECT vec_id, em,
      |    CAST(list_sum(list_transform(em, v -> v * v)) AS BIGINT) AS nrm
      |  FROM e
      |), c1 AS (
      |  SELECT vec_id AS cid, em AS cm, nrm AS cnrm FROM n WHERE vec_id < 8
      |)""".stripMargin

  /** One assignment + mean-update round against centroid CTE `c`,
    * emitting long-form `o$sfx` — the SQL twin of [[stepFrom]],
    * suffixed so iterations chain structurally. */
  private[graft] def stepCtes(c: String, sfx: String): String =
    s"""d$sfx AS (
      |  SELECT n.vec_id, n.em, $c.cid,
      |    n.nrm + $c.cnrm - 2 * CAST(list_sum(
      |      list_transform(generate_series(1, len(n.em)),
      |        i -> n.em[i] * $c.cm[i])) AS BIGINT) AS d2
      |  FROM n, $c
      |), a$sfx AS (
      |  SELECT vec_id, em, cid,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      |  FROM d$sfx
      |), o$sfx AS (
      |  SELECT cid, CAST(i - 1 AS BIGINT) AS dim,
      |    CAST(count(*) AS BIGINT) AS n_assigned,
      |    CAST(sum(em[i]) AS BIGINT) AS sum_milli,
      |    CAST(sum(em[i]) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_milli
      |  FROM a$sfx, unnest(generate_series(1, len(em))) t(i)
      |  WHERE rn = 1
      |  GROUP BY cid, i
      |)""".stripMargin

  /** Fold `o$from`'s means into the next round's centroid CTE — the
    * SQL twin of [[meansAsCentroids]]. */
  private[graft] def centroidCte(from: String, out: String): String =
    s"""$out AS (
      |  SELECT cid, cm,
      |    CAST(list_sum(list_transform(cm, v -> v * v)) AS BIGINT) AS cnrm
      |  FROM (SELECT cid, list(mean_milli ORDER BY dim) AS cm
      |        FROM o$from GROUP BY cid)
      |)""".stripMargin

  private val finalSelect: String =
    """SELECT cid AS centroid, dim, n_assigned, sum_milli, mean_milli
      |FROM o""".stripMargin

  def oracleSql: String =
    s"WITH $baseCtes,\n${stepCtes("c1", "1")}\n$finalSelect" + "1"

  // ---- second-iteration gate (hash-gated) ----

  /** Gated instance: TWO full Lloyd rounds — the second scores against
    * centroids derived from the first round's means, so the feedback
    * edge ([[meansAsCentroids]]) is itself inside the hash gate. */
  def kmeansStep2Embeddings(spark: SparkSession, dir: String): DataFrame =
    iterate(Tables.embeddings(spark, dir), "vec_id", "embedding",
      k = 8, iters = 2)

  def oracle2Sql: String =
    s"WITH $baseCtes,\n${stepCtes("c1", "1")},\n${centroidCte("1", "c2")},\n" +
      s"${stepCtes("c2", "2")}\n$finalSelect" + "2"
}
