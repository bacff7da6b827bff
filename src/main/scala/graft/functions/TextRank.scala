package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** TextRank keyword extraction (Mihalcea & Tarau 2004) — weighted
  * PageRank over the word co-occurrence graph, the unsupervised
  * keyword scorer that needs no model artifact: the corpus-level
  * companion of [[TextScoring]]'s per-query tf-idf/BM25 (those rank
  * documents for a query; this ranks WORDS for a corpus — the salient-
  * term extraction feeding tag clouds, topic labels, and the prompt-
  * mining side of dataset curation,
  * /root/reference/NLP/llama2/src/prep.py corpus assembly).
  *
  * Arithmetic contract (the [[graft.operators.PageRank]] discipline,
  * extended to WEIGHTED edges): ranks are BIGINT micros; one iteration
  * is r'(v) = 150000 + damp(Σ_{u~v} (r(u)·w_uv) DIV W_u) with the
  * damping product decomposed (850000·(s DIV 1e6) + (850000·(s MOD
  * 1e6)) DIV 1e6) so ANSI BIGINT never overflows on hub words; the
  * per-edge product rides DECIMAL(38,0) (count weights reach 10¹² at
  * corpus scale). Every division truncates on non-negatives — both
  * engines bit-identical at ANY iteration count.
  *
  * Scale: bigram explode is map-side; the edge table is VOCABULARY-
  * bounded (|V|² worst case, Zipf-sparse in practice) regardless of
  * corpus size; iterations are joins on the word key over that bounded
  * table. The 100 TB cost is the token scan.
  */
object TextRank {

  private val DampMicros = 850000L
  private val BaseMicros = 150000L

  /** Adjacent-word co-occurrence edges (both directions) with count
    * weights, from whitespace tokens of `textCol`. */
  def cooccurrenceEdges(df: DataFrame, textCol: String): DataFrame = {
    val bigrams = df
      .select(split(col(textCol), "\\s+").as("w"))
      .select(explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
          " (a, b) -> struct(a, b))")).as("p"))
      .select(col("p.a").as("src"), col("p.b").as("dst"))
      .filter(col("src") =!= col("dst"))
    val counted = bigrams.groupBy("src", "dst").agg(count(lit(1)).as("w1"))
    // undirected: weight(u,v) = count(u→v) + count(v→u), emitted both ways
    counted.unionByName(counted.select(col("dst").as("src"),
        col("src").as("dst"), col("w1")))
      .groupBy("src", "dst").agg(sum(col("w1")).as("weight"))
  }

  /** (word, rank_micros) after `iters` weighted-PageRank iterations
    * over `edges` (src, dst, weight). */
  def ranks(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val e = edges.select(col("src"), col("dst"), col("weight"))
      .localCheckpoint() // loop invariant
    val eW = e.withColumn("__wsum",
        sum(col("weight")).over(Window.partitionBy("src")))
      .localCheckpoint()
    val nodes = e.select(col("src").as("word")).distinct().localCheckpoint()
    var r = nodes.withColumn("rank_micros", lit(1000000L))
    for (i <- 1 to iters) {
      val contrib = eW
        .join(r.withColumnRenamed("word", "src"), "src")
        .select(col("dst").as("word"),
          // per-edge truncating share; DECIMAL carries rank·weight
          expr("CAST(rank_micros AS DECIMAL(38,0)) * weight DIV __wsum")
            .as("__c"))
        .groupBy("word").agg(sum("__c").as("__in"))
      r = nodes.join(contrib, Seq("word"), "left")
        .withColumn("rank_micros",
          expr(s"${BaseMicros}L + $DampMicros * (coalesce(__in, 0L) DIV 1000000L)" +
            s" + ($DampMicros * (coalesce(__in, 0L) % 1000000L)) DIV 1000000L"))
        .drop("__in")
      if (i % 5 == 0 && i < iters) r = r.localCheckpoint(eager = true)
    }
    r
  }

  /** Top-`k` keywords by (rank DESC, word ASC): (word, rank_micros,
    * rk). */
  def keywords(df: DataFrame, textCol: String, iters: Int, k: Int): DataFrame =
    ranks(cooccurrenceEdges(df, textCol), iters)
      .orderBy(col("rank_micros").desc, col("word").asc).limit(k)
      .withColumn("rk", row_number().over( // k-row frame post-limit
        Window.orderBy(col("rank_micros").desc, col("word").asc))
        .cast("long"))

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: top-20 corpus keywords, 3 iterations. */
  def textrankDocuments(spark: SparkSession, dir: String): DataFrame =
    keywords(Tables.documents(spark, dir), "text", iters = 3, k = 20)

  private def iterSql(prev: String): String =
    s"""SELECT n.word,
      |  $BaseMicros + $DampMicros * (coalesce(c.inm, 0) // 1000000)
      |    + ($DampMicros * (coalesce(c.inm, 0) % 1000000)) // 1000000
      |    AS rank_micros
      |FROM nodes n LEFT JOIN (
      |  SELECT e.dst AS word,
      |    sum((CAST(r.rank_micros AS HUGEINT) * e.weight) // e.wsum) AS inm
      |  FROM ew e JOIN $prev r ON e.src = r.word
      |  GROUP BY e.dst) c ON n.word = c.word""".stripMargin

  def oracleSql: String =
    s"""WITH toks AS (
      |  SELECT string_split_regex(text, '\\s+') AS w FROM documents
      |), bg AS (
      |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
      |    i -> struct_pack(src := w[i], dst := w[i+1]))) AS p
      |  FROM toks WHERE len(w) >= 2
      |), dir_e AS (
      |  SELECT p.src AS src, p.dst AS dst, count(*) AS w1
      |  FROM bg WHERE p.src <> p.dst GROUP BY 1, 2
      |), e AS (
      |  SELECT src, dst, CAST(sum(w1) AS BIGINT) AS weight FROM (
      |    SELECT src, dst, w1 FROM dir_e
      |    UNION ALL SELECT dst AS src, src AS dst, w1 FROM dir_e)
      |  GROUP BY 1, 2
      |), ew AS (
      |  SELECT src, dst, weight,
      |    sum(weight) OVER (PARTITION BY src) AS wsum
      |  FROM e
      |), nodes AS (SELECT DISTINCT src AS word FROM e),
      |r0 AS (SELECT word, CAST(1000000 AS BIGINT) AS rank_micros FROM nodes),
      |r1 AS (${iterSql("r0")}),
      |r2 AS (${iterSql("r1")}),
      |r3 AS (${iterSql("r2")})
      |SELECT word, CAST(rank_micros AS BIGINT) AS rank_micros,
      |  CAST(row_number() OVER (ORDER BY rank_micros DESC, word ASC)
      |    AS BIGINT) AS rk
      |FROM r3 ORDER BY rank_micros DESC, word ASC LIMIT 20""".stripMargin
}
