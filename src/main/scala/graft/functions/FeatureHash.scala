package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Hashing-trick feature vectors (Weinberger et al.'s signed feature
  * hashing) — the fixed-width, vocabulary-free encoder next to
  * [[BowVectors]]' learned-vocabulary embedding and
  * [[graft.operators.FeatureEncoders]]' fitted encoders: bucket =
  * h(w) mod D, sign = ±1 from the next hash bit, weight = Σ sign over
  * occurrences. No fit, no broadcast dictionary, no OOV — the encoder
  * that needs NO training pass at 100 TB
  * (/root/reference/MachineLearning/Spark/count_target_onehot_encoder_spark.py
  * family without the fitted state).
  *
  * The token hash is the repo's portable character-level polynomial
  * (a·131 + c mod 1e9+7 — the [[TextFunctions]] / doc_fingerprint
  * hash both engines already share), so the sparse vectors hash-match
  * DuckDB exactly. Map-side explode + one (doc, bucket)-keyed
  * aggregate; output ≤ docs·D rows.
  */
object FeatureHash {
  val M = 1000000007L
  val D = 32 // buckets

  private def tokHash(w: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(w)), i => ascii(w.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, c) => (acc * lit(131L) + c) % lit(M))

  /** Sparse hashed vectors: (idCol, bucket, weight, n_terms) — weight
    * is the signed count, n_terms the unsigned occurrence count. */
  def hashedVectors(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol),
        explode(split(col(textCol), "\\s+")).as("w"))
      .select(col(idCol), tokHash(col("w")).as("h"))
      .select(col(idCol),
        (col("h") % D).cast("int").as("bucket"),
        // sign bit comes from ABOVE the bucket bits so they decorrelate
        (expr(s"(h div $D) % 2") * 2L - 1L).as("sign"))
    tok.groupBy(col(idCol), col("bucket"))
      .agg(sum(col("sign")).as("weight"), count(lit(1)).as("n_terms"))
  }

  // ---- query-map entry (hash-gated) ----

  def featureHashDocs(spark: SparkSession, dir: String): DataFrame =
    hashedVectors(Tables.documents(spark, dir), "doc_id", "text")

  def oracleSql: String =
    s"""WITH tok AS (
      |  SELECT doc_id,
      |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(generate_series(1, len(w)),
      |        i -> CAST(ascii(substr(w, i, 1)) AS BIGINT))),
      |      (a, c) -> (a*131 + c) % $M) AS BIGINT) AS h
      |  FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS w
      |        FROM documents)
      |)
      |SELECT doc_id, CAST(h % $D AS INT) AS bucket,
      |  CAST(sum(((h // $D) % 2) * 2 - 1) AS BIGINT) AS weight,
      |  CAST(count(*) AS BIGINT) AS n_terms
      |FROM tok
      |GROUP BY 1, 2""".stripMargin
}
