package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions

/** Per-dimension embedding statistics — the normalization pre-pass of a
  * vector-search pipeline (mean-centering and per-dim scaling decide
  * whether IVF/PQ codebooks train well; FAISS preprocessing does
  * exactly this before the index the reference builds,
  * /root/reference/MachineLearning/ML/performant_faiss.py).
  *
  * Exactness: components are quantized to milli-units by the SAME
  * compiled expression the ANN family scores with
  * ([[VectorFunctions.quantize]] ⇔ the oracle's `floor(x·1000)`), so
  * per-dim sums and sums-of-squares are exact BIGINTs; mean and
  * variance are one fixed expression per OUTPUT dimension,
  * micros-rounded. Headroom: Σq² ≤ rows · (1000·maxAbs)² — at
  * milli-quantized unit-scale embeddings that is ~1e6 per row, BIGINT
  * to ~9e12 rows per dimension.
  *
  * Scale: one posexplode scan, one aggregate keyed on the dimension
  * index (fixed cardinality = vector width) with map-side combine.
  */
object EmbedStats {

  /** (dim, n, mean_milli_micros, var_milli2_micros, min_q, max_q) per
    * vector dimension of `vecCol`, over milli-quantized components. */
  def dimStats(df: DataFrame, vecCol: String): DataFrame = {
    val q = df.select(posexplode(VectorFunctions.quantize(col(vecCol)))
      .as(Seq("dim", "__q")))
    q.groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("__q").as("__s"),
        sum(col("__q") * col("__q")).as("__ss"),
        min("__q").as("min_q"), max("__q").as("max_q"))
      .withColumn("mean_milli_micros",
        round(col("__s").cast("double") / col("n") * lit(1e6)).cast("long"))
      .withColumn("var_milli2_micros",
        round((col("__ss").cast("double") / col("n")
          - (col("__s").cast("double") / col("n"))
            * (col("__s").cast("double") / col("n"))) * lit(1e6)).cast("long"))
      .select("dim", "n", "mean_milli_micros", "var_milli2_micros",
        "min_q", "max_q")
  }

  /** Mean-centered quantized embeddings in long format — the transform
    * [[dimStats]] exists to feed (FAISS-style preprocessing: centering
    * before codebook training removes the DC component that wastes the
    * first principal direction). `centered_q = q − round(mean_dim)`,
    * all integers: the per-dim means ride in as a broadcast
    * vector-width table, the corpus is touched once, and the result
    * stays exactly representable for downstream integer scoring. */
  def centered(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = df.select(col(idCol),
      posexplode(VectorFunctions.quantize(col(vecCol))).as(Seq("dim", "__q")))
    val means = dimStats(df, vecCol)
      .select(col("dim"),
        round(col("mean_milli_micros") / lit(1e6)).cast("long").as("__m"))
    q.join(broadcast(means), "dim")
      .select(col(idCol), col("dim"),
        (col("__q") - col("__m")).as("centered_q"))
  }

  // ---- query-map entries (hash-gated) ----

  def embedDimStats(spark: SparkSession, dir: String): DataFrame =
    dimStats(Tables.embeddings(spark, dir), "embedding")

  def embedCenter(spark: SparkSession, dir: String): DataFrame =
    centered(Tables.embeddings(spark, dir), "vec_id", "embedding")

  def oracleSql: String =
    """WITH q AS (
      |  SELECT unnest(list_transform(embedding,
      |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS qv,
      |         unnest(range(0, len(embedding))) AS dim
      |  FROM embeddings
      |)
      |SELECT CAST(dim AS INT) AS dim, count(*) AS n,
      |  CAST(round(CAST(sum(qv) AS DOUBLE) / count(*) * 1e6) AS BIGINT)
      |    AS mean_milli_micros,
      |  CAST(round((CAST(sum(qv * qv) AS DOUBLE) / count(*)
      |    - (CAST(sum(qv) AS DOUBLE) / count(*))
      |      * (CAST(sum(qv) AS DOUBLE) / count(*))) * 1e6) AS BIGINT)
      |    AS var_milli2_micros,
      |  CAST(min(qv) AS BIGINT) AS min_q, CAST(max(qv) AS BIGINT) AS max_q
      |FROM q GROUP BY dim""".stripMargin

  def centerOracleSql: String =
    """WITH q AS (
      |  SELECT vec_id,
      |         unnest(list_transform(embedding,
      |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))) AS qv,
      |         unnest(range(0, len(embedding))) AS dim
      |  FROM embeddings
      |), m AS (
      |  SELECT dim, CAST(round(
      |      round(CAST(sum(qv) AS DOUBLE) / count(*) * 1e6) / 1e6)
      |    AS BIGINT) AS mu
      |  FROM q GROUP BY dim
      |)
      |SELECT vec_id, CAST(q.dim AS INT) AS dim, qv - mu AS centered_q
      |FROM q JOIN m ON q.dim = m.dim""".stripMargin
}
