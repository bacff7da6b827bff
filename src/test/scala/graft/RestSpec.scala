package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger
import com.sun.net.httpserver.HttpServer
import graft.sources.Rest
import org.apache.spark.sql.types._

/** Paged-REST source contracts against a local HTTP stub: envelope
  * paging to exhaustion, schema decode with lineage columns, bounded
  * retry on transient failures, refusal to truncate silently, and the
  * executor-side slice fan-out path. No external network is touched. */
class RestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  /** Stub server: /items pages 3×2 records via ?page=tokens; /flaky
    * fails the FIRST call per token with 500 then succeeds; /tenant
    * serves one page whose records carry the tenant query param. */
  private def withServer(test: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val failures = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    def pageBody(page: Int, last: Int): String = {
      val recs = (0 until 2).map(i =>
        s"""{"id":${page * 10 + i},"name":"r${page}_$i"}""").mkString(",")
      val next = if (page < last) s""","next":"t${page + 1}"""" else ""
      s"""{"value":[$recs]$next}"""
    }
    def q(query: String, p: String): Option[String] =
      Option(query).flatMap(_.split("&").find(_.startsWith(p + "="))
        .map(_.substring(p.length + 1)))
    def pageOf(query: String): Int =
      q(query, "page").map(_.stripPrefix("t").toInt).getOrElse(0)
    server.createContext("/items", ex => {
      val body = pageBody(pageOf(ex.getRequestURI.getRawQuery), 2)
        .getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body); ex.close()
    })
    server.createContext("/flaky", ex => {
      val tok = q(ex.getRequestURI.getRawQuery, "page").getOrElse("first")
      val n = failures.computeIfAbsent(tok, _ => new AtomicInteger).incrementAndGet()
      if (n == 1) { ex.sendResponseHeaders(500, -1); ex.close() }
      else {
        val body = pageBody(pageOf(ex.getRequestURI.getRawQuery), 1)
          .getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body); ex.close()
      }
    })
    server.createContext("/tenant", ex => {
      val t = q(ex.getRequestURI.getRawQuery, "t").getOrElse("?")
      val body =
        s"""{"value":[{"id":1,"name":"$t"},{"id":2,"name":"$t"}]}"""
          .getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body); ex.close()
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("readPaged drains the token chain and decodes with lineage") {
    withServer { base =>
      val df = Rest.readPaged(spark,
        Rest.httpPager(s"$base/items", Map("Authorization" -> "Bearer t")),
        schema)
      assert(df.columns.toSeq ==
        Seq("_slice", "_page", "_offset", "_raw", "id", "name"))
      val rows = df.select("_page", "_offset", "id", "name")
        .as[(Int, Int, Long, String)].collect().toSet
      assert(rows == (for (p <- 0 to 2; i <- 0 to 1)
        yield (p, i, (p * 10 + i).toLong, s"r${p}_$i")).toSet)
    }
  }

  test("transient 500s are retried with backoff; chain completes") {
    withServer { base =>
      val df = Rest.readPaged(spark,
        Rest.httpPager(s"$base/flaky", Map.empty), schema, backoffMs = 1)
      assert(df.count() == 4L, "both pages must land despite first-call 500s")
    }
  }

  test("a chain longer than maxPages fails loudly instead of truncating") {
    withServer { base =>
      val e = intercept[IllegalArgumentException] {
        Rest.readPaged(spark, Rest.httpPager(s"$base/items", Map.empty),
          schema, maxPages = 2)
      }
      assert(e.getMessage.contains("maxPages"))
    }
  }

  test("readSlices fans tenant chains out across executors") {
    withServer { base =>
      val slices = Seq("alpha", "beta", "gamma")
      val df = Rest.readSlices(spark, slices,
        s => Rest.httpPager(s"$base/tenant?t=$s", Map.empty), schema)
      val got = df.select("_slice", "name").as[(String, String)]
        .collect().toSet
      assert(got == slices.map(s => (s, s)).toSet ||
        got == slices.flatMap(s => Seq((s, s))).toSet)
      assert(df.count() == 6L)
      // lineage: every slice contributes its own page-0 chain
      assert(df.filter($"_page" === 0).count() == 6L)
    }
  }

  test("malformed records decode to nulls but keep _raw for replay") {
    var served = false
    val fetch: Rest.PageFetch = _ => {
      served = true
      (Seq("""{"id":7,"name":"ok"}""", """not json at all"""), None)
    }
    val df = Rest.readPaged(spark, fetch, schema)
    val rows = df.select("id", "_raw").as[(Option[Long], String)].collect()
    assert(rows.length == 2 && served)
    assert(rows.exists(r => r._1.contains(7L)))
    assert(rows.exists(r => r._1.isEmpty && r._2 == "not json at all"),
      "bad record must survive as _raw with null projection")
  }
}
