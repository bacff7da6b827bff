package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text cleaning for LLM corpus prep: PII redaction, canonical
  * normalization, and a C4-style rule-based quality filter.
  *
  * Mirrors the scrub step of the reference's SFT data prep
  * (/root/reference/NLP/llama2/src/prepare_dataset.py:14-40 strips
  * serial-number-like tokens before templating) generalized to the
  * standard corpus-cleaning patterns (emails / phone numbers / SSNs,
  * whitespace+case canonicalization, and the C4 heuristic filters).
  *
  * All three are map-side `functions._` pipelines — zero shuffles, zero
  * UDFs, fully whole-stage-codegen'd: at 100 TB these run at scan speed
  * and the only cost is the regex engine per row. The regex patterns are
  * written in the common Java/RE2 subset so the DuckDB oracle evaluates
  * the SAME pattern text (both gates are exact hash matches).
  */
object TextClean {

  // Patterns are shared Spark<->oracle; keep them in the Java∩RE2 subset
  // (no lookbehind, no backrefs — \b, \d, classes and bounds only).
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ssnRe   = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  val urlRe = "https?://[A-Za-z0-9./_%+?=&#-]+"

  /** Entity EXTRACTION into long format — the inverse consumer of the
    * same patterns [[redact]] deletes: (id, kind, value, n_th) rows for
    * every email/url/ssn/phone occurrence, the table a curation
    * pipeline aggregates into blocklists, contact-frequency stats, and
    * link graphs. Map-side explode of `regexp_extract_all` — zero
    * shuffles, codegen'd; rows with no matches contribute nothing. */
  def extractEntities(df: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val kinds = Seq("email" -> emailRe, "url" -> urlRe,
      "ssn" -> ssnRe, "phone" -> phoneRe)
    kinds.map { case (kind, re) =>
      df.select(col(idCol),
          posexplode(regexp_extract_all(col(textCol), lit(re), lit(0)))
            .as(Seq("n_th", "value")))
        .withColumn("kind", lit(kind))
        .withColumn("n_th", col("n_th").cast("long") + 1)
        .select(col(idCol), col("kind"), col("value"), col("n_th"))
    }.reduce(_ unionByName _)
  }

  /** Redact PII in `textCol`: emails → [EMAIL], SSNs → [SSN], phones →
    * [PHONE], with per-row match counts. SSN before phone: the two are
    * disjoint shapes (3-2-4 vs 3-3-4) but redacting the more specific
    * first keeps the rule order auditable. Library entry point. */
  def redact(df: DataFrame, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val nEmail = size(regexp_extract_all(t0, lit(emailRe), lit(0)))
    val nSsn   = size(regexp_extract_all(t0, lit(ssnRe), lit(0)))
    val nPhone = size(regexp_extract_all(t0, lit(phoneRe), lit(0)))
    val red = regexp_replace(
      regexp_replace(regexp_replace(t0, emailRe, "[EMAIL]"), ssnRe, "[SSN]"),
      phoneRe, "[PHONE]")
    df.withColumn("n_emails", nEmail.cast("int"))
      .withColumn("n_ssns", nSsn.cast("int"))
      .withColumn("n_phones", nPhone.cast("int"))
      .withColumn("redacted", red)
  }

  /** Gated instance: documents with synthetic-but-deterministic PII
    * appended (the corpus itself is PII-free, so the gate plants a known
    * mix: every row an email, every 3rd an SSN, every 4th a phone) then
    * redacted. The injection is part of the query on BOTH sides, so the
    * redaction itself is what the hash gate exercises. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(
      col("doc_id"),
      concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.org"),
        when(col("doc_id") % 3 === 0, lit(" ssn 123-45-6789")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit(" call 555-867-5309")).otherwise(lit(""))
      ).as("text"))
    redact(docs, "text").select("doc_id", "n_emails", "n_ssns", "n_phones", "redacted")
  }

  /** Gated extraction instance: same planted-PII corpus as [[piiRedact]]
    * plus a URL every 5th row — the long-format inverse of the redact
    * gate, so the two gates cross-check the same patterns. */
  def extractEntitiesDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(
      col("doc_id"),
      concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.org"),
        when(col("doc_id") % 3 === 0, lit(" ssn 123-45-6789")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit(" call 555-867-5309")).otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" see https://example.org/d/"), col("doc_id").cast("string")))
          .otherwise(lit(""))
      ).as("text"))
    extractEntities(docs, "doc_id", "text")
  }

  def extractEntitiesOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    text || ' contact user' || doc_id || '@example.org'
      |      || CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-6789' ELSE '' END
      |      || CASE WHEN doc_id % 4 = 0 THEN ' call 555-867-5309' ELSE '' END
      |      || CASE WHEN doc_id % 5 = 0
      |           THEN ' see https://example.org/d/' || doc_id ELSE '' END AS text
      |  FROM documents
      |), pat AS (
      |  SELECT 'email' AS kind,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}' AS re
      |  UNION ALL SELECT 'url', 'https?://[A-Za-z0-9./_%+?=&#-]+'
      |  UNION ALL SELECT 'ssn', '\b\d{3}-\d{2}-\d{4}\b'
      |  UNION ALL SELECT 'phone', '\b\d{3}-\d{3}-\d{4}\b'
      |), m AS (
      |  SELECT doc_id, kind, regexp_extract_all(text, re) AS ms
      |  FROM t CROSS JOIN pat
      |)
      |SELECT doc_id, kind, unnest(ms) AS value,
      |  unnest(range(1, len(ms) + 1)) AS n_th
      |FROM m""".stripMargin

  def piiRedactOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    text || ' contact user' || doc_id || '@example.org'
      |      || CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-6789' ELSE '' END
      |      || CASE WHEN doc_id % 4 = 0 THEN ' call 555-867-5309' ELSE '' END AS text
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
      |  CAST(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS INT) AS n_ssns,
      |  CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phones,
      |  regexp_replace(regexp_replace(regexp_replace(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |    '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
      |    '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS redacted
      |FROM t""".stripMargin

  /** Canonical text normalization: lowercase, strip non-alphanumerics to
    * spaces, collapse whitespace runs, trim. The standard pre-tokenizer /
    * pre-dedup canonical form (exact-dedup keys and shingles should see
    * normalized text, not raw). Library entry point over any frame. */
  def normalize(df: DataFrame, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9\\s]", " "), "\\s+", " "))
    df.withColumn("norm_text", norm)
      .withColumn("n_norm_tokens",
        when(norm === "", 0).otherwise(size(split(norm, " "))).cast("int"))
  }

  /** Gated instance over documents. */
  def textNormalize(spark: SparkSession, dir: String): DataFrame =
    normalize(Tables.documents(spark, dir), "text")
      .select("doc_id", "norm_text", "n_norm_tokens")

  def textNormalizeOracleSql: String =
    """WITH t AS (SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
      |       '\s+', ' ', 'g')) AS norm_text
      |FROM documents)
      |SELECT doc_id, norm_text,
      |  CAST(CASE WHEN norm_text = '' THEN 0
      |       ELSE len(string_split(norm_text, ' ')) END AS INT) AS n_norm_tokens
      |FROM t""".stripMargin

  /** C4-style rule-based quality filter: every rule is evaluated, the
    * verdict plus a deterministic comma-joined reason list is emitted per
    * document (keep/drop with WHY — the auditable form; a bare filter()
    * loses the why). Rules, over [[TextFunctions.withQuality]] metrics:
    *   short        — fewer than `minTokens` whitespace tokens
    *   repetitive   — unique/total token ratio below `minUniq`
    *   punct_heavy  — punctuation chars per char above `maxPunct`
    *   no_stopwords — stopword ratio below `minStop` (C4's "no English
    *                  function words" ⇒ likely not prose)
    * Map-side only; the verdict column makes the downstream keep-filter a
    * pushable predicate. */
  def qualityFilter(df: DataFrame, textCol: String,
                    minTokens: Int = 30, minUniq: Double = 0.45,
                    maxPunct: Double = 0.2, minStop: Double = 0.02): DataFrame = {
    val q = TextFunctions.withQuality(df, textCol)
    val reasons = concat_ws(",",
      when(col("n_tokens") < minTokens, "short"),
      when(col("uniq_ratio") < minUniq, "repetitive"),
      when(col("punct_ratio") > maxPunct, "punct_heavy"),
      when(col("stop_ratio") < minStop, "no_stopwords"))
    q.withColumn("drop_reasons", reasons)
      .withColumn("keep", col("drop_reasons") === "")
  }

  /** Gated instance over documents. */
  def qualityFilterDocs(spark: SparkSession, dir: String): DataFrame =
    qualityFilter(Tables.documents(spark, dir), "text")
      .select("doc_id", "keep", "drop_reasons")

  def qualityFilterOracleSql: String =
    """WITH t AS (SELECT doc_id, text, string_split_regex(text, '\s+') ws FROM documents),
      |q AS (SELECT doc_id,
      |  len(ws) AS n_tokens,
      |  CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS uniq_ratio,
      |  CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in'))) AS DOUBLE)
      |    / len(ws) AS stop_ratio,
      |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE) / len(text) AS punct_ratio
      |FROM t),
      |r AS (SELECT doc_id, concat_ws(',',
      |  CASE WHEN n_tokens < 30 THEN 'short' END,
      |  CASE WHEN uniq_ratio < 0.45 THEN 'repetitive' END,
      |  CASE WHEN punct_ratio > 0.2 THEN 'punct_heavy' END,
      |  CASE WHEN stop_ratio < 0.02 THEN 'no_stopwords' END) AS drop_reasons
      |FROM q)
      |SELECT doc_id, drop_reasons = '' AS keep, drop_reasons FROM r""".stripMargin
}
