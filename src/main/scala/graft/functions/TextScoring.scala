package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Corpus relevance scoring: TF-IDF term weights and BM25 document
  * scores, the retrieval-side complement of the reference's embedding
  * ranking (/root/reference/MachineLearning/Ray/performant_faiss.py ranks
  * by dense similarity; these are the sparse/lexical equivalents used to
  * curate and rank LLM training corpora).
  *
  * Both are pure `functions._` pipelines over one tokenization pass —
  * explode → two integer aggregates — so every input is an exact integer
  * (tf, df, dl, N) and the per-row scoring is a fixed scalar expression
  * tree evaluated identically per row in any engine. Scores are emitted
  * as integer MICROS (round(score·1e6)) so the hash gate never rides on
  * float-sum ordering: BM25's per-document sum adds already-rounded
  * BIGINTs, which is associative. The one float AGGREGATE is BM25's
  * `avg(dl)`: its partial sums add integer-valued doubles, which stay
  * exact (hence order-independent) as long as the total token count is
  * below 2^53 — a bound that holds with room to spare at 100 TB of text
  * (~2.5e13 tokens) and is the load-bearing assumption here.
  *
  * Scale: tokenize is map-side; tf is one shuffle on (doc, term); df
  * reuses tf with a shuffle on term; the join back to tf is term-keyed.
  * No driver-side collection anywhere — corpus constants (N, avgdl) ride
  * a broadcast single-row frame into the plan.
  */
object TextScoring {

  /** Lowercased alphanumeric tokens, empties removed — mirrored exactly
    * by the oracle's `string_split_regex(lower(text),'[^a-z0-9]+')`. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Per-(doc, term) smoothed TF-IDF:
    * `tf · (ln((N+1)/(df+1)) + 1)` in integer micros, where N counts
    * docs with ≥1 token. */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = tf.select(col("doc_id")).distinct().agg(count(lit(1)).as("__n"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score_micros",
        round(col("tf") *
          (log((col("__n") + lit(1)).cast("double") / (col("df") + lit(1)).cast("double"))
            + lit(1.0)) * lit(1e6)).cast("long"))
      .select("doc_id", "term", "tf", "df", "score_micros")
  }

  /** Per-document BM25 (k1=1.2, b=0.75) against a fixed query-term set.
    * Only docs hitting ≥1 query term appear. Per-term contributions are
    * rounded to micros BEFORE the per-doc sum, keeping the sum exact. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "need at least one query term")
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(avg(col("dl")).as("__avgdl"), count(lit(1)).as("__n"))
    val qtf = tok.filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val qdf = qtf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("__avgdl"))
    qtf.join(qdf, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("__term_micros",
        round(idf * col("tf") * lit(k1 + 1.0) / norm * lit(1e6)).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum("__term_micros").as("score_micros"))
  }

  // ---- query-map entries (hash-gated) ----

  def tfidfTerms(spark: SparkSession, dir: String): DataFrame =
    tfIdf(Tables.documents(spark, dir), "doc_id", "text")

  val Bm25Query: Seq[String] = Seq("spark", "join", "merge")

  def bm25Topk(spark: SparkSession, dir: String): DataFrame =
    bm25(Tables.documents(spark, dir), "doc_id", "text", Bm25Query)

  private val TokCte =
    """tok AS (
      |  SELECT doc_id, unnest(list_filter(
      |    string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS term
      |  FROM documents
      |)""".stripMargin

  def tfidfOracleSql: String =
    s"""WITH $TokCte,
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(DISTINCT doc_id) AS n FROM tf)
       |SELECT tf.doc_id, tf.term, tf.tf, df.df,
       |  CAST(round(tf.tf * (ln(CAST(n.n + 1 AS DOUBLE) / CAST(df.df + 1 AS DOUBLE))
       |       + 1.0) * 1e6) AS BIGINT) AS score_micros
       |FROM tf JOIN df USING (term) CROSS JOIN n""".stripMargin

  def bm25OracleSql: String =
    s"""WITH $TokCte,
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
       |stats AS (SELECT avg(dl) AS avgdl, count(*) AS n FROM dl),
       |qtf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       |        WHERE term IN ('spark', 'join', 'merge') GROUP BY 1, 2),
       |qdf AS (SELECT term, count(*) AS df FROM qtf GROUP BY 1)
       |SELECT doc_id, count(*) AS n_terms_hit,
       |  CAST(sum(CAST(round(
       |    ln(1.0 + (s.n - qdf.df + 0.5) / (qdf.df + 0.5))
       |      * qtf.tf * 2.2
       |      / (qtf.tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE) / s.avgdl))
       |      * 1e6) AS BIGINT)) AS BIGINT) AS score_micros
       |FROM qtf JOIN qdf USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
       |GROUP BY doc_id""".stripMargin
}
