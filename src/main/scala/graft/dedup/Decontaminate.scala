package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Benchmark decontamination: drop training documents that share any
  * n-word-gram with an evaluation/benchmark set — the standard guard
  * against test-set leakage in LLM training corpora (run between
  * curation and the submix step the reference builds in
  * /root/reference/MachineLearning/Data/flan2022_submix/spark_data_generating.py;
  * its eval splits must never leak into the training mix).
  *
  * Shape: both sides explode into n-gram rows (map-side Expand over a
  * bound words array — the per-row lambda touches only the pre-split
  * array, no re-tokenization per element); the benchmark side is
  * distincted and BROADCAST — benchmark suites are small by construction,
  * so the contamination probe is a map-side semi join: the corpus grams
  * never shuffle. Only the matched doc ids (a set bounded by corpus
  * cardinality, usually tiny) reach a shuffle, and the final anti join
  * back is AQE-broadcastable. Documents with fewer than n words produce
  * no grams and therefore cannot be flagged.
  */
object Decontaminate {

  /** (id, gram) rows: every n-word shingle of `textCol`. */
  def grams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol), TextFunctions.words(col(textCol)).as("__ws"))
      .select(col(idCol), explode(
        when(size(col("__ws")) >= n,
          transform(sequence(lit(1), size(col("__ws")) - (n - 1)),
            i => concat_ws(" ", slice(col("__ws"), i, lit(n)))))
          .otherwise(array())).as("gram"))

  /** Distinct corpus ids sharing at least one n-gram with `bench`. */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame, idCol: String,
                      textCol: String, n: Int): DataFrame = {
    val benchGrams = grams(bench, idCol, textCol, n)
      .select("gram").distinct()
    grams(corpus, idCol, textCol, n)
      .join(broadcast(benchGrams), "gram")
      .select(idCol).distinct()
  }

  /** `corpus` minus every document sharing an n-gram with `bench`. */
  def decontaminate(corpus: DataFrame, bench: DataFrame, idCol: String,
                    textCol: String, n: Int = 8): DataFrame =
    corpus.join(contaminatedIds(corpus, bench, idCol, textCol, n),
      Seq(idCol), "left_anti")

  // ---- query-map entry (hash-gated) ----

  /** Benchmark = every 17th document; corpus = the rest, scrubbed of any
    * doc sharing an 8-gram with the benchmark (the planted near-dups in
    * the documents table make real hits). */
  def decontaminateDocuments(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val corpus = docs.filter(col("doc_id") % 17 =!= 0)
    decontaminate(corpus, bench, "doc_id", "text", n = 8)
      .select("doc_id", "source")
  }

  def oracleSql: String =
    """WITH bench AS (
      |  SELECT doc_id, string_split_regex(text, '\s+') AS w
      |  FROM documents WHERE doc_id % 17 = 0),
      |corpus AS (
      |  SELECT doc_id, source, string_split_regex(text, '\s+') AS w
      |  FROM documents WHERE doc_id % 17 <> 0),
      |bgrams AS (
      |  SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS gram
      |  FROM bench, unnest(generate_series(1, greatest(len(w)-7, 0))) AS t(i)),
      |hits AS (
      |  SELECT DISTINCT doc_id FROM (
      |    SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram
      |    FROM corpus, unnest(generate_series(1, greatest(len(w)-7, 0))) AS t(i)) g
      |  JOIN bgrams USING (gram))
      |SELECT doc_id, source FROM corpus
      |WHERE doc_id NOT IN (SELECT doc_id FROM hits)""".stripMargin
}
