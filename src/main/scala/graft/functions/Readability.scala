package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Readability scoring per document — Flesch Reading Ease and
  * Flesch–Kincaid grade over cheap lexical proxies (words = maximal
  * non-space runs, sentences = terminal-punctuation runs, syllables =
  * vowel-group runs). The classic curation signal next to
  * [[TextScoring]]'s quality ratios: the reference's SFT-prep pipeline
  * filters training text on exactly this kind of surface statistic
  * (/root/reference/MachineLearning/SFT/completions_preprocess.py
  * length/structure gates) before tokenization.
  *
  * Exactness: the three counts are `regexp_count` integers (identical
  * RE class semantics in Java regex and DuckDB's RE2 for the character
  * classes used), and both scores are staged truncating permicro
  * divisions over BIGINTs — FRE = 206.835 − 1.015·W/S − 84.6·Y/W and
  * FK = 0.39·W/S + 11.8·Y/W − 15.59, each ratio scaled to micros
  * BEFORE its single truncation, constants exact in micros. All
  * division operands are non-negative, so trunc = floor in both
  * engines. Punctuation-free documents take the documented
  * one-sentence floor (`greatest(1, …)`), making the score total
  * rather than null-poisoned.
  *
  * Scale: embarrassingly parallel — one projection per document row,
  * no shuffle, whole-stage codegen end to end (regexp_count is a
  * codegen'd native expression). 100 TB of documents is a map-only
  * scan.
  */
object Readability {

  private val WordRe = "[^ \\t\\r\\n]+"
  private val SentRe = "[.!?]+"
  private val SyllRe = "[aeiouy]+"

  /** Adds (words, sentences, syllables, fre_permicro, fk_permicro)
    * computed from `textCol`. */
  def score(df: DataFrame, textCol: Column): DataFrame = {
    val lo = lower(textCol)
    df
      .withColumn("words",
        greatest(lit(1L), regexp_count(lo, lit(WordRe)).cast("long")))
      .withColumn("sentences",
        greatest(lit(1L), regexp_count(lo, lit(SentRe)).cast("long")))
      .withColumn("syllables", regexp_count(lo, lit(SyllRe)).cast("long"))
      .withColumn("fre_permicro",
        expr("""206835000L - (1015000L * words) div sentences
                - (84600000L * syllables) div words"""))
      .withColumn("fk_permicro",
        expr("""(390000L * words) div sentences
                + (11800000L * syllables) div words - 15590000L"""))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: per-document readability over the corpus. */
  def readabilityDocs(spark: SparkSession, dir: String): DataFrame =
    score(Tables.table(spark, dir, "documents"), col("text"))
      .select("doc_id", "words", "sentences", "syllables",
        "fre_permicro", "fk_permicro")

  def oracleSql: String =
    """WITH c AS (
      |  SELECT doc_id,
      |    greatest(1, CAST(length(regexp_extract_all(lower(text),
      |      '[^ \t\r\n]+')) AS BIGINT)) AS words,
      |    greatest(1, CAST(length(regexp_extract_all(lower(text),
      |      '[.!?]+')) AS BIGINT)) AS sentences,
      |    CAST(length(regexp_extract_all(lower(text),
      |      '[aeiouy]+')) AS BIGINT) AS syllables
      |  FROM documents
      |)
      |SELECT doc_id, words, sentences, syllables,
      |  206835000 - (1015000 * words) // sentences
      |    - (84600000 * syllables) // words AS fre_permicro,
      |  (390000 * words) // sentences
      |    + (11800000 * syllables) // words - 15590000 AS fk_permicro
      |FROM c""".stripMargin
}
