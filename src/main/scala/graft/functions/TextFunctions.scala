package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis column functions for LLM-training-data curation:
  * token counting, quality scoring, language-ID heuristics, rolling-hash
  * fingerprinting.
  *
  * Everything here is built from codegen'd `functions._` expressions
  * (split / transform / aggregate / filter) — no UDFs — so the whole
  * pipeline stays inside WholeStageCodegen and scales as a pure
  * map-side projection: zero shuffles, zero driver traffic, linear in
  * input bytes. That is the property that matters at 100 TB: these run
  * at parquet-scan speed.
  *
  * Reference anchors: the reference repo curates LLM training text via
  * driver-side Python (e.g. /root/reference/MachineLearning/Data/
  * flan2022_submix/spark_data_generating.py); these operators give the
  * same pipeline distributed, expression-level equivalents.
  */
object TextFunctions {

  private val M = 1000000007L // rolling-hash modulus (fits BIGINT arithmetic)

  /** Whitespace tokens. */
  def words(text: Column): Column = split(text, "\\s+")

  /** BPE-ish lexer tokens: letter runs, digit runs, single punctuation. */
  def reTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Estimated subword count: ceil(len/4) per word — the usual
    * chars-per-token heuristic for BPE vocabularies. */
  def estSubwords(text: Column): Column =
    aggregate(words(text), lit(0L),
      (acc, w) => acc + floor((length(w) + lit(3)) / lit(4)))

  /** Character-level polynomial rolling hash of one token, mod M. */
  private def tokHash(w: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(w)), i => ascii(w.substr(i, lit(1))).cast("long")),
      lit(0L),
      (acc, c) => (acc * lit(131L) + c) % lit(M))

  /** Token-level polynomial rolling hash of the whole document, mod M.
    * Order-sensitive (unlike a bag-of-words hash): reordered text
    * fingerprints differently, byte-identical text identically.
    * Compiled via [[PolyFingerprint]] (registered on the active session,
    * invoked through `call_function`) — the equivalent nested-aggregate
    * expression form is [[fingerprintExpr]], kept as the executable
    * specification the spec suite cross-checks against. */
  def fingerprint(text: Column): Column =
    Native.call("graft_poly_fingerprint",
      exprs => PolyFingerprint(exprs.head), text)

  /** Expression-form fingerprint (interpreted; the semantic reference). */
  def fingerprintExpr(text: Column): Column =
    aggregate(words(text), lit(0L),
      (acc, w) => (acc * lit(31L) + tokHash(w)) % lit(M))

  private def hitCount(ws: Column, markers: Seq[String]): Column =
    size(filter(ws, w => w.isin(markers.map(lit): _*))).cast("int")

  // public, language-characteristic function words (locale marker lists)
  private val enMarkers = Seq("the", "a", "of", "and", "is", "to")
  private val frMarkers = Seq("le", "la", "les", "et", "des", "une")
  private val deMarkers = Seq("der", "die", "und", "das", "ein", "ist")
  private val esMarkers = Seq("el", "los", "las", "y", "una", "es")

  // ---- query-map entries ----

  /** #34 text_tokens: token counts per document. */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(words(col("text"))).cast("int").as("n_ws_tokens"),
      size(reTokens(col("text"))).cast("int").as("n_re_tokens"),
      estSubwords(col("text")).as("est_subwords"),
      length(col("text")).cast("int").as("n_chars"))

  def textTokensOracleSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(text, '\s+')) AS INT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_re_tokens,
      |  CAST(list_sum(list_transform(string_split_regex(text, '\s+'),
      |       w -> (len(w)+3)//4)) AS BIGINT) AS est_subwords,
      |  CAST(len(text) AS INT) AS n_chars
      |FROM documents""".stripMargin

  /** Generic form of #35: append the quality metric columns to ANY frame
    * with a text column — the library entry point (the gated
    * [[textQuality]] is this over the documents table). All map-side
    * codegen'd expressions; per-row arithmetic is deterministic. */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val ws = words(col(textCol))
    val nTok = size(ws)
    val nUnique = size(array_distinct(ws))
    val nStop = hitCount(ws, enMarkers :+ "in")
    val nPunct = size(regexp_extract_all(col(textCol), lit("[^A-Za-z0-9\\s]"), lit(0)))
    val uniqR = nUnique.cast("double") / nTok
    val stopR = nStop.cast("double") / nTok
    val punctR = nPunct.cast("double") / length(col(textCol))
    val lenR = least(nTok.cast("double") / lit(100), lit(1.0))
    df.withColumn("n_tokens", nTok.cast("int"))
      .withColumn("n_unique", nUnique.cast("int"))
      .withColumn("n_stop", nStop.cast("int"))
      .withColumn("uniq_ratio", uniqR)
      .withColumn("stop_ratio", stopR)
      .withColumn("punct_ratio", punctR)
      .withColumn("quality_score",
        stopR * lit(0.3) + uniqR * lit(0.3) + (lit(1.0) - punctR) * lit(0.2)
          + lenR * lit(0.2))
  }

  /** #35 text_quality: length / punctuation / stopword / uniqueness ratios
    * and a composite score. Per-row arithmetic is deterministic, so the
    * doubles hash-match the oracle bit-for-bit with no rounding. */
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    withQuality(Tables.documents(spark, dir), "text")
      .select("doc_id", "n_tokens", "n_unique", "n_stop",
        "uniq_ratio", "stop_ratio", "punct_ratio", "quality_score")

  def textQualityOracleSql: String =
    """WITH t AS (SELECT doc_id, text, string_split_regex(text, '\s+') ws FROM documents),
      |q AS (SELECT doc_id,
      |  CAST(len(ws) AS INT) AS n_tokens,
      |  CAST(len(list_distinct(ws)) AS INT) AS n_unique,
      |  CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to','in'))) AS INT) AS n_stop,
      |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS INT) AS n_punct,
      |  CAST(len(text) AS INT) AS n_chars
      |FROM t)
      |SELECT doc_id, n_tokens, n_unique, n_stop,
      |  CAST(n_unique AS DOUBLE) / n_tokens AS uniq_ratio,
      |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
      |  CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
      |  (CAST(n_stop AS DOUBLE) / n_tokens) * 0.3
      |    + (CAST(n_unique AS DOUBLE) / n_tokens) * 0.3
      |    + (1.0 - CAST(n_punct AS DOUBLE) / n_chars) * 0.2
      |    + least(CAST(n_tokens AS DOUBLE) / 100, 1.0) * 0.2 AS quality_score
      |FROM q""".stripMargin

  /** #36 text_langid: marker-word language ID. Scores each document
    * against per-language function-word lists; argmax with a fixed
    * tie-break order (en > fr > de > es > und). */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    val en = hitCount(ws, enMarkers)
    val fr = hitCount(ws, frMarkers)
    val de = hitCount(ws, deMarkers)
    val es = hitCount(ws, esMarkers)
    Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      en.as("en_hits"), fr.as("fr_hits"), de.as("de_hits"), es.as("es_hits"),
      when(en >= fr && en >= de && en >= es && en > 0, "en")
        .when(fr >= de && fr >= es && fr > 0, "fr")
        .when(de >= es && de > 0, "de")
        .when(es > 0, "es")
        .otherwise("und").as("pred_lang"),
      (en.cast("double") / size(ws)).as("marker_density"))
  }

  def textLangidOracleSql: String =
    """WITH t AS (SELECT doc_id, lang, string_split_regex(text, '\s+') ws FROM documents),
      |h AS (SELECT doc_id, lang, CAST(len(ws) AS INT) AS n,
      |  CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','is','to'))) AS INT) AS en_hits,
      |  CAST(len(list_filter(ws, w -> w IN ('le','la','les','et','des','une'))) AS INT) AS fr_hits,
      |  CAST(len(list_filter(ws, w -> w IN ('der','die','und','das','ein','ist'))) AS INT) AS de_hits,
      |  CAST(len(list_filter(ws, w -> w IN ('el','los','las','y','una','es'))) AS INT) AS es_hits
      |FROM t)
      |SELECT doc_id, lang, en_hits, fr_hits, de_hits, es_hits,
      |  CASE WHEN en_hits >= fr_hits AND en_hits >= de_hits AND en_hits >= es_hits AND en_hits > 0 THEN 'en'
      |       WHEN fr_hits >= de_hits AND fr_hits >= es_hits AND fr_hits > 0 THEN 'fr'
      |       WHEN de_hits >= es_hits AND de_hits > 0 THEN 'de'
      |       WHEN es_hits > 0 THEN 'es'
      |       ELSE 'und' END AS pred_lang,
      |  CAST(en_hits AS DOUBLE) / n AS marker_density
      |FROM h""".stripMargin

  /** Extra beyond SURVEY §2 — corpus-level curation stats: per
    * (source, lang) document counts, token/char volume, and mean quality
    * inputs. The aggregation layer a data-curation dashboard reads; one
    * partial-aggregated shuffle on a low-cardinality key at any scale. */
  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), col("lang"),
        size(words(col("text"))).cast("long").as("__tok"),
        length(col("text")).cast("long").as("__chars"),
        estSubwords(col("text")).as("__sub"))
      .groupBy("source", "lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__tok").as("total_tokens"),
        sum("__chars").as("total_chars"),
        sum("__sub").as("total_subwords"),
        round(avg("__tok"), 4).as("avg_tokens"))

  def corpusStatsOracleSql: String =
    """SELECT source, lang,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS total_tokens,
      |  CAST(sum(len(text)) AS BIGINT) AS total_chars,
      |  CAST(sum(list_sum(list_transform(string_split_regex(text, '\s+'),
      |       w -> (len(w)+3)//4))) AS BIGINT) AS total_subwords,
      |  round(avg(len(string_split_regex(text, '\s+'))), 4) AS avg_tokens
      |FROM documents
      |GROUP BY source, lang""".stripMargin

  /** #37 doc_fingerprint: order-sensitive rolling polynomial hash. */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(words(col("text"))).cast("int").as("n_tokens"),
      fingerprint(col("text")).as("fingerprint"))

  /** #37b winnow_fingerprints: MOSS winnowing selection (k=3 token
    * grams, window w=4) — guaranteed-coverage local fingerprints via
    * [[WinnowSelect]], exploded to (doc_id, pos, hash) rows. */
  def winnowFingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      explode(Native.call("graft_winnow_3_4",
        exprs => WinnowSelect(exprs.head, 3, 4), col("text"))).as("enc"))
      .select(col("doc_id"),
        expr("CAST(enc div 1000000007 AS BIGINT)").as("pos"),
        expr("CAST(enc % 1000000007 AS BIGINT)").as("hash"))
      .distinct()

  def winnowOracleSql: String =
    """WITH th AS (
      |  SELECT doc_id, list_transform(string_split_regex(text, '\s+'),
      |    w -> CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           list_transform(generate_series(1, len(w)),
      |             i -> CAST(ascii(substr(w, i, 1)) AS BIGINT))),
      |         (a, c) -> (a*131 + c) % 1000000007) AS BIGINT)) AS th
      |  FROM documents
      |), kg AS (
      |  SELECT doc_id, list_transform(generate_series(1, len(th) - 2),
      |    i -> CAST((((th[i]*31 + th[i+1]) % 1000000007) * 31 + th[i+2])
      |      % 1000000007 AS BIGINT)) AS kg
      |  FROM th WHERE len(th) >= 3
      |), win AS (
      |  SELECT doc_id, kg, least(4, len(kg)) AS ww,
      |    unnest(generate_series(1, len(kg) - least(4, len(kg)) + 1)) AS j
      |  FROM kg
      |), pick AS (
      |  SELECT doc_id, kg,
      |    j + ww - list_position(
      |      list_reverse(list_slice(kg, j, j + ww - 1)),
      |      list_min(list_slice(kg, j, j + ww - 1))) AS pos
      |  FROM win
      |)
      |SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos,
      |  kg[pos] AS hash
      |FROM pick""".stripMargin

  def docFingerprintOracleSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(text, '\s+')) AS INT) AS n_tokens,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split_regex(text, '\s+'),
      |      w -> CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |             list_transform(generate_series(1, len(w)),
      |               i -> CAST(ascii(substr(w, i, 1)) AS BIGINT))),
      |           (a, c) -> (a*131 + c) % 1000000007) AS BIGINT))),
      |    (a, h) -> (a*31 + h) % 1000000007) AS BIGINT) AS fingerprint
      |FROM documents""".stripMargin
}
