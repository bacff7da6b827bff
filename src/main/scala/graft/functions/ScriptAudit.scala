package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Mixed-script homoglyph audit — the spoofing screen a text-curation
  * pipeline runs beside [[TextClean]]'s PII redaction: tokens that mix
  * Latin letters with Cyrillic/Greek CONFUSABLES (а е о р с х і ѕ / ο
  * α ε — glyphs indistinguishable from Latin in most fonts) are the
  * classic impersonation/poisoning vector (Unicode TR39 confusable
  * detection, the skeleton algorithm's per-script core); a training
  * corpus wants them found, counted, and normalizable. Content-level
  * cleaning cannot see this — the text LOOKS identical.
  *
  * The gated instance PLANTS deterministic spoofs (every 50th doc gets
  * its a/e/o translated to Cyrillic а/е/о — both engines apply the
  * same `translate`, the impute_median planting discipline) so the
  * detector's positive path is exercised against an exact oracle.
  * Detection is per-token regex + translate-delete counting — map-side
  * only; output is flagged docs (bounded by the planting rate) each
  * carrying the global summary.
  */
object ScriptAudit {
  /** Confusable Cyrillic/Greek codepoints mapped by normalization. */
  val Confusables = "аеорсхіѕοαε"
  val LatinEquiv  = "aeopcxisoae"

  /** Flagged docs (doc_id, n_tokens, n_mixed, n_confusable_chars,
    * spoof_permille) + global (n_docs_flagged, total_mixed_tokens). */
  def audit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val perDoc = tok
      .withColumn("mixed",
        col("w").rlike("[a-z]") && col("w").rlike(s"[$Confusables]"))
      .withColumn("n_conf",
        length(col("w")) - length(translate(col("w"), Confusables, "")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("mixed"), 1L).otherwise(0L)).as("n_mixed"),
        sum(when(col("mixed"), col("n_conf")).otherwise(0L))
          .as("n_confusable_chars"))
      .filter(col("n_mixed") > 0L)
      .withColumn("spoof_permille", expr("(1000 * n_mixed) div n_tokens"))
      .localCheckpoint() // consumed by output AND the summary aggregate
    val summary = perDoc.agg(
      count(lit(1)).as("n_docs_flagged"),
      coalesce(sum(col("n_mixed")), lit(0L)).as("total_mixed_tokens"))
    perDoc.crossJoin(broadcast(summary))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: every 50th document carries a planted homoglyph
    * spoof (a/e/o → Cyrillic а/е/о); the audit must flag exactly the
    * planted set. */
  def scriptAuditDocs(spark: SparkSession, dir: String): DataFrame = {
    val planted = Tables.documents(spark, dir).select(col("doc_id"),
      when(col("doc_id") % 50 === 0, translate(col("text"), "aeo", "аео"))
        .otherwise(col("text")).as("text"))
    audit(planted, "doc_id", "text")
  }

  def oracleSql: String =
    s"""WITH planted AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 50 = 0 THEN translate(text, 'aeo', 'аео')
      |         ELSE text END AS text
      |  FROM documents
      |), tok AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
      |  FROM planted
      |), scored AS (
      |  SELECT doc_id, w,
      |    regexp_matches(w, '[a-z]') AND regexp_matches(w, '[$Confusables]')
      |      AS mixed,
      |    length(w) - length(translate(w, '$Confusables', '')) AS n_conf
      |  FROM tok WHERE w <> ''
      |), per_doc AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(sum(CASE WHEN mixed THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed,
      |    CAST(sum(CASE WHEN mixed THEN n_conf ELSE 0 END) AS BIGINT)
      |      AS n_confusable_chars
      |  FROM scored GROUP BY 1
      |), flagged AS (
      |  SELECT doc_id, n_tokens, n_mixed, n_confusable_chars,
      |    CAST((1000 * n_mixed) // n_tokens AS BIGINT) AS spoof_permille
      |  FROM per_doc WHERE n_mixed > 0
      |), summary AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs_flagged,
      |    CAST(coalesce(sum(n_mixed), 0) AS BIGINT) AS total_mixed_tokens
      |  FROM flagged
      |)
      |SELECT f.doc_id, f.n_tokens, f.n_mixed, f.n_confusable_chars,
      |  f.spoof_permille, s.n_docs_flagged, s.total_mixed_tokens
      |FROM flagged f CROSS JOIN summary s""".stripMargin
}
