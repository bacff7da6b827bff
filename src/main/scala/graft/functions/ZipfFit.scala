package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Zipf's-law fit over the rank–frequency curve — log-log OLS slope of
  * the top-K term frequencies: the corpus-health scalar beside
  * [[Vocab]]'s coverage and [[GoodTuring]]'s count-of-counts (natural
  * corpora fit slope ≈ −1; heavily templated or deduplicated-to-death
  * corpora bend away from it), the quick audit a curation pipeline
  * runs after every major filter
  * (/root/reference/MachineLearning/Data/flan2022_submix/
  * spark_data_generating.py mix sanity).
  *
  * Exactness (the [[NgramStats]] surprisal discipline): x = ln(rank)
  * and y = ln(freq) round ONCE per point to micros; from there the
  * OLS normal equations run on exact BIGINT/DECIMAL sums of those
  * integers and both slope and intercept are sign-split truncating
  * permicro divisions. The fit window is the top-K=1000 ranks under
  * the (freq DESC, term ASC) total order, so the point set — hence
  * every sum — is deterministic cross-engine at any scale; K bounds
  * x,y ≤ ~28·10⁶ micros, so Σxy ≤ 10³·8·10¹⁴ and n·Σxy ≤ 10¹⁸: the
  * DECIMAL carriers never strain.
  *
  * Scale: token explode map-side, one (term) groupBy, then a global
  * top-K (TakeOrdered — no full sort) over the vocabulary. The 100 TB
  * cost is the scan.
  */
object ZipfFit {

  /** One row: (n_points, slope_permicro, intercept_permicro) of the
    * ln(freq) ~ ln(rank) OLS over the top-K terms. */
  def fit(df: DataFrame, termCol: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = df.groupBy(col(termCol).as("term"))
      .agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("term"))
      .limit(topK)
    // rank within the K-bounded point set (window over ≤ K rows)
    val pts = top
      .withColumn("rk", row_number().over(
        Window.orderBy(col("f").desc, col("term"))))
      .select(
        round(log(col("rk").cast("double")) * 1e6).cast("long").as("x"),
        round(log(col("f").cast("double")) * 1e6).cast("long").as("y"))
    pts.agg(
        count(lit(1)).as("np"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      .select(col("np").as("n_points"),
        // slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), permicro sign-split
        expr("""CASE WHEN np * sxx - sx * sx <> 0 THEN
            (CASE WHEN np * sxy - sx * sy < 0 THEN -1L ELSE 1L END)
              * ((CAST(1000000 AS DECIMAL(38,0)) * abs(np * sxy - sx * sy))
                  div abs(np * sxx - sx * sx))
          END""").as("slope_permicro"),
        // intercept = (Σy − slope·Σx)/n from the QUANTIZED slope
        expr("""CASE WHEN np * sxx - sx * sx <> 0 THEN
            (CASE WHEN 1000000 * sy
                - ((CASE WHEN np * sxy - sx * sy < 0 THEN -1L ELSE 1L END)
                   * ((CAST(1000000 AS DECIMAL(38,0)) * abs(np * sxy - sx * sy))
                       div abs(np * sxx - sx * sx))) * sx < 0
              THEN -1L ELSE 1L END)
              * (abs(1000000 * sy
                  - ((CASE WHEN np * sxy - sx * sy < 0 THEN -1L ELSE 1L END)
                     * ((CAST(1000000 AS DECIMAL(38,0)) * abs(np * sxy - sx * sy))
                         div abs(np * sxx - sx * sx))) * sx)
                 div (CAST(1000000 AS DECIMAL(38,0)) * np))
          END""").as("intercept_permicro"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: lowercased alphanumeric word tokens over the
    * document corpus, top-1000 ranks. */
  def zipfDocuments(spark: SparkSession, dir: String): DataFrame =
    fit(
      Tables.documents(spark, dir).select(
        explode(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .as("w")),
      "w", topK = 1000)

  def oracleSql: String =
    """WITH toks AS (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |  FROM documents
      |), top AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM toks GROUP BY 1
      |  ORDER BY f DESC, w LIMIT 1000
      |), pts AS (
      |  SELECT
      |    CAST(round(ln(CAST(row_number() OVER (ORDER BY f DESC, w)
      |      AS DOUBLE)) * 1e6) AS BIGINT) AS x,
      |    CAST(round(ln(CAST(f AS DOUBLE)) * 1e6) AS BIGINT) AS y
      |  FROM top
      |), acc AS (
      |  SELECT CAST(count(*) AS BIGINT) AS np,
      |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      |  FROM pts
      |)
      |SELECT np AS n_points,
      |  CASE WHEN np * sxx - sx * sx <> 0 THEN CAST(
      |    (CASE WHEN np * sxy - sx * sy < 0 THEN -1 ELSE 1 END)
      |      * ((1000000 * abs(np * sxy - sx * sy))
      |          // abs(np * sxx - sx * sx)) AS BIGINT)
      |  END AS slope_permicro,
      |  CASE WHEN np * sxx - sx * sx <> 0 THEN CAST(
      |    (CASE WHEN 1000000 * sy
      |        - ((CASE WHEN np * sxy - sx * sy < 0 THEN -1 ELSE 1 END)
      |           * ((1000000 * abs(np * sxy - sx * sy))
      |               // abs(np * sxx - sx * sx))) * sx < 0
      |      THEN -1 ELSE 1 END)
      |      * (abs(1000000 * sy
      |          - ((CASE WHEN np * sxy - sx * sy < 0 THEN -1 ELSE 1 END)
      |             * ((1000000 * abs(np * sxy - sx * sy))
      |                 // abs(np * sxx - sx * sx))) * sx)
      |         // (1000000 * np)) AS BIGINT)
      |  END AS intercept_permicro
      |FROM acc""".stripMargin
}
