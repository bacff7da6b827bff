package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** SFT dataset preparation — the engine-side twin of the reference's
  * fine-tuning data prep
  * (/root/reference/NLP/llama2/src/prepare_dataset.py: serial-number
  * scrub via regex, quality filter, drop_duplicates, train/test split,
  * instruct-prompt templating, then token-length stats over the result).
  * Everything here is distributed, deterministic, and oracle-checkable.
  *
  * Scale shape: scrub + templating are map-side codegen'd string
  * expressions; the dedup is one (content, label) aggregation keeping
  * min id; the split is the pure row-value hash filter ([[Sampling]]).
  * The length stats use a HISTOGRAM cumulation — windows run over
  * (split × distinct-length) rows, bounded by max sequence length, never
  * by corpus size: exact order statistics without a data-sized sort.
  */
object SftPrep {

  /** prepare_dataset.py's serial-number pattern: any token with a
    * digit-letter or letter-digit adjacency. */
  val SerialPattern = "[\\d\\w]*\\d\\w[\\d\\w]*|[\\d\\w]*\\w\\d[\\d\\w]*"

  val SystemMessage =
    "Identify the language of the input. Ignore serial numbers."

  /** Scrub serials, dedup on (input, label) keeping min id, split by
    * hash, and render the llama-instruct prompt. */
  def prepare(df: DataFrame, idCol: String, inputCol: String,
              labelCol: String, trainFrac: Double): DataFrame = {
    val scrubbed = df.withColumn("__in",
      regexp_replace(col(inputCol), SerialPattern, ""))
    val deduped = scrubbed
      .groupBy(col("__in"), col(labelCol))
      .agg(min(col(idCol)).as("sft_id"))
    val cut = (trainFrac * Sampling.M).toLong
    deduped
      .withColumn("split",
        when(Sampling.portableBucket(col("sft_id")) < cut, "train")
          .otherwise("test"))
      .withColumn("prompt", concat(
        lit("<s>[INST] <<SYS>>\n"), lit(SystemMessage), lit("<</SYS>>\n"),
        col("__in"), lit(" [/INST] "), col(labelCol), lit(" </s>")))
      .select(col("sft_id"), col("split"), col("prompt"))
  }

  /** Exact length order-statistics per split via histogram cumulation:
    * n, min, element at n DIV 2 (prepare_dataset.py's median), element
    * at floor(0.99·n) (its 99th percentile, floor-indexed), max. */
  def lengthStats(prompts: DataFrame, splitCol: String,
                  textCol: String): DataFrame = {
    val lens = prompts.select(col(splitCol),
      size(TextFunctions.words(col(textCol))).cast("long").as("len"))
    val hist = lens.groupBy(col(splitCol), col("len")).count()
    val wCum = Window.partitionBy(col(splitCol)).orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("__cum", sum("count").over(wCum))
    val tot = lens.groupBy(col(splitCol)).agg(count(lit(1)).as("n_docs"))
    cum.join(tot, splitCol)
      .groupBy(col(splitCol), col("n_docs"))
      .agg(
        min("len").as("min_len"),
        min(when(col("__cum") > expr("n_docs DIV 2"), col("len"))).as("median_len"),
        min(when(col("__cum") > floor(col("n_docs") * 0.99).cast("long"),
          col("len"))).as("p99_len"),
        max("len").as("max_len"))
  }

  // ---- query-map entries (hash-gated) ----

  /** Every doc gets a synthetic serial appended (the corpus has none),
    * so the scrub provably fires inside the gate; labels = lang. */
  private def sftInput(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      concat(col("text"), lit(" SN"), col("doc_id").cast("string"), lit("X unit"))
        .as("dirty"),
      col("lang"))

  def sftPrepare(spark: SparkSession, dir: String): DataFrame =
    prepare(sftInput(spark, dir), "doc_id", "dirty", "lang", trainFrac = 0.8)

  def sftLengthStats(spark: SparkSession, dir: String): DataFrame =
    lengthStats(sftPrepare(spark, dir), "split", "prompt")

  private val preparedSql =
    s"""dirty AS (
       |  SELECT doc_id,
       |    text || ' SN' || CAST(doc_id AS VARCHAR) || 'X unit' AS dirty, lang
       |  FROM documents),
       |scrubbed AS (
       |  SELECT doc_id,
       |    regexp_replace(dirty, '$SerialPattern', '', 'g') AS input, lang
       |  FROM dirty),
       |deduped AS (
       |  SELECT input, lang, min(doc_id) AS sft_id
       |  FROM scrubbed GROUP BY input, lang),
       |prepared AS (
       |  SELECT sft_id,
       |    CASE WHEN ((sft_id % 100003) * 1103515245 + 12345) % 1000000 < 800000
       |         THEN 'train' ELSE 'test' END AS split,
       |    '<s>[INST] <<SYS>>' || chr(10) || '$SystemMessage' || '<</SYS>>'
       |      || chr(10) || input || ' [/INST] ' || lang || ' </s>' AS prompt
       |  FROM deduped)""".stripMargin

  // NOTE: preparedSql is concatenated, never re-interpolated into another
  // stripMargin string — its `||` continuation lines would lose a pipe to
  // a second margin strip.
  def prepareOracleSql: String =
    "WITH " + preparedSql +
      "\nSELECT sft_id, split, prompt FROM prepared"

  def lengthStatsOracleSql: String =
    "WITH " + preparedSql + ",\n" +
      """lens AS (
        |  SELECT split,
        |    CAST(len(string_split_regex(prompt, '\s+')) AS BIGINT) AS len
        |  FROM prepared),
        |hist AS (SELECT split, len, count(*) AS c FROM lens GROUP BY split, len),
        |cum AS (
        |  SELECT split, len, sum(c) OVER (PARTITION BY split ORDER BY len
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM hist),
        |tot AS (SELECT split, CAST(count(*) AS BIGINT) AS n_docs FROM lens GROUP BY split)
        |SELECT split, n_docs,
        |  min(len) AS min_len,
        |  min(CASE WHEN cum > n_docs // 2 THEN len END) AS median_len,
        |  min(CASE WHEN cum > CAST(floor(n_docs * 0.99) AS BIGINT) THEN len END)
        |    AS p99_len,
        |  max(len) AS max_len
        |FROM cum JOIN tot USING (split)
        |GROUP BY split, n_docs""".stripMargin
}
