package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic paged-REST ingestion seam — the reference's second-most-common
  * source after storage: a GET that returns a page of records plus a
  * continuation token, drained to exhaustion and landed as a DataFrame
  * (/root/reference/DataEngineering/Python/adal_generic_get_request.py
  * pages a REST API with a bearer token;
  * metrics_query.py / kusto_query.py fan the same shape out over query
  * slices). AUTH IS INJECTED, never implemented: callers pass opaque
  * header key/values (bearer token, api-key) obtained elsewhere —
  * exactly the seam the reference's `adal` call sits behind.
  *
  * Scale shape, two levels:
  *  - WITHIN a cursor chain, paging is inherently sequential (each call
  *    needs the previous token), so a single chain drains in the driver
  *    with bounded retries — fine, because a cursor API is itself the
  *    bottleneck, not Spark.
  *  - ACROSS chains is where 100 TB lives: [[readSlices]] distributes
  *    independent slice descriptors (time windows, tenants, shards —
  *    metrics_query.py's per-resource loop) over EXECUTORS via
  *    mapPartitions, each draining its own chain; ingestion parallelism
  *    = slice count, and records never pass through the driver.
  *
  * Output contract (both paths): one row per record with lineage —
  * `_slice` (slice id or "" for the single-chain path), `_page`
  * (0-based page ordinal within its chain), `_offset` (0-based record
  * ordinal within its page) — plus the caller-schema columns decoded
  * from the record JSON by `from_json` (distributed, codegen'd; a bad
  * record yields nulls, the permissive-mode lineage a landing zone
  * wants). Raw record text is retained as `_raw` for bronze-layer
  * replay ([[graft.operators.Medallion]] discipline).
  */
object Rest {

  /** Fetch one page: previous continuation token (None = first page) →
    * (records as JSON strings, next token). Implementations must be
    * pure-ish: a retried call with the same token may re-fetch. */
  type PageFetch = Option[String] => (Seq[String], Option[String])

  /** Drain one cursor chain with bounded retries and exponential
    * backoff (transient REST failures are the norm, the reference
    * retries too). Returns (page, offset, record) triples. */
  private[sources] def drain(fetch: PageFetch, maxPages: Int, retries: Int,
                             backoffMs: Long): Seq[(Int, Int, String)] = {
    val out = Seq.newBuilder[(Int, Int, String)]
    var token: Option[String] = None
    var page = 0
    var done = false
    while (!done && page < maxPages) {
      var attempt = 0
      var result: Option[(Seq[String], Option[String])] = None
      while (result.isEmpty) {
        try result = Some(fetch(token))
        catch {
          case e: Exception if attempt < retries =>
            attempt += 1
            Thread.sleep(backoffMs << (attempt - 1)) // 1x, 2x, 4x, ...
          case e: Exception =>
            throw new RuntimeException(
              s"REST page $page failed after $retries retries", e)
        }
      }
      val (records, next) = result.get
      records.zipWithIndex.foreach { case (r, i) => out += ((page, i, r)) }
      token = next
      page += 1
      done = next.isEmpty
    }
    require(token.isEmpty || page < maxPages,
      s"cursor chain exceeded maxPages=$maxPages — refusing to truncate silently")
    out.result()
  }

  private def decode(raw: DataFrame, schema: StructType): DataFrame =
    raw.withColumn("__parsed", from_json(col("_raw"), schema))
      .select(col("_slice") +: col("_page") +: col("_offset") +:
        col("_raw") +: schema.fieldNames.toSeq.map(f => col(s"__parsed.$f")): _*)

  /** Single cursor chain → DataFrame (driver-side drain, distributed
    * decode). */
  def readPaged(spark: SparkSession, fetch: PageFetch, schema: StructType,
                maxPages: Int = 10000, retries: Int = 3,
                backoffMs: Long = 100): DataFrame = {
    import spark.implicits._
    val rows = drain(fetch, maxPages, retries, backoffMs)
      .map { case (p, i, r) => ("", p, i, r) }
    decode(rows.toDF("_slice", "_page", "_offset", "_raw"), schema)
  }

  /** Slice fan-out: each slice id maps (ON AN EXECUTOR) to its own
    * cursor chain via `mkFetch`, which must be serializable — carry
    * URLs/params/injected headers as data, not live connections.
    * Slices are spread round-robin over `math.min(slices, parallelism)`
    * partitions; records are born distributed. */
  def readSlices(spark: SparkSession, slices: Seq[String],
                 mkFetch: String => PageFetch, schema: StructType,
                 maxPages: Int = 10000, retries: Int = 3,
                 backoffMs: Long = 100): DataFrame = {
    import spark.implicits._
    val parts = math.max(1, math.min(slices.size,
      spark.sparkContext.defaultParallelism))
    val raw: Dataset[(String, Int, Int, String)] =
      spark.createDataset(slices).repartition(parts)
        .mapPartitions { it =>
          it.flatMap { s =>
            drain(mkFetch(s), maxPages, retries, backoffMs)
              .iterator.map { case (p, i, r) => (s, p, i, r) }
          }
        }
    decode(raw.toDF("_slice", "_page", "_offset", "_raw"), schema)
  }

  /** HTTP GET pager over a token-paged endpoint — the
    * adal_generic_get_request.py shape with auth INJECTED as opaque
    * headers. The endpoint contract: GET `url?…&<tokenParam>=<token>`
    * returns `{"value": [...records...], "next": "<token>"|absent}`
    * (the ubiquitous REST envelope; override field names as needed).
    * Serializable by construction (strings only), so it works under
    * [[readSlices]]. */
  def httpPager(url: String, headers: Map[String, String],
                tokenParam: String = "page",
                valueField: String = "value",
                nextField: String = "next"): PageFetch = {
    token => {
      val sep = if (url.contains("?")) "&" else "?"
      val full = token.fold(url)(t => s"$url$sep$tokenParam=" +
        java.net.URLEncoder.encode(t, "UTF-8"))
      val conn = new java.net.URL(full).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setRequestMethod("GET")
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        conn.setConnectTimeout(10000)
        conn.setReadTimeout(60000)
        val code = conn.getResponseCode
        if (code != 200) sys.error(s"HTTP $code from $full")
        val body = new String(conn.getInputStream.readAllBytes(),
          StandardCharsets.UTF_8)
        val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
        val recs = Option(root.get(valueField)) match {
          case Some(arr) =>
            val it = arr.elements()
            val b = Seq.newBuilder[String]
            while (it.hasNext) b += it.next().toString
            b.result()
          case None => sys.error(s"REST envelope missing '$valueField' at $full")
        }
        val next = Option(root.get(nextField))
          .filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
        (recs, next)
      } finally conn.disconnect()
    }
  }
}
