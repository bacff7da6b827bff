package graft

import java.nio.file.Files
import java.sql.DriverManager
import org.apache.spark.sql.functions._
import graft.sources.Jdbc

/** JDBC source contract spec'd against an embedded Derby database (on the
  * unmanaged Spark classpath): content fidelity, range-partitioned
  * parallel fetch, filter pushdown to the remote scan, pushed-query
  * mode. */
class JdbcSpec extends SparkSpec {

  private lazy val url: String = {
    val dir = Files.createTempDirectory("graft_derby").toString
    val u = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE metrics (id BIGINT NOT NULL, site VARCHAR(16), score DOUBLE)")
    val ins = conn.prepareStatement("INSERT INTO metrics VALUES (?, ?, ?)")
    (1 to 100).foreach { i =>
      ins.setLong(1, i.toLong); ins.setString(2, s"site_${i % 4}")
      ins.setDouble(3, i * 1.5); ins.addBatch()
    }
    ins.executeBatch(); ins.close(); st.close(); conn.close()
    u
  }

  private val props = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")

  test("unpartitioned read returns full table content") {
    val df = Jdbc.read(spark, url, "metrics", props = props)
    assert(df.count() == 100)
    val r = df.filter(col("ID") === 7).head()
    assert(r.getString(r.fieldIndex("SITE")) == "site_3" &&
      r.getDouble(r.fieldIndex("SCORE")) == 10.5)
  }

  test("range partitioning fans the fetch into numPartitions slices, losslessly") {
    val df = Jdbc.read(spark, url, "metrics",
      partitioning = Some(Jdbc.Partitioning("ID", 1, 100, 4)), props = props)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.select(sum("ID")).head().getLong(0) == 5050L)
    // rows outside the bounds still arrive (bounds shape slices, not a filter)
    val dfNarrow = Jdbc.read(spark, url, "metrics",
      partitioning = Some(Jdbc.Partitioning("ID", 40, 60, 3)), props = props)
    assert(dfNarrow.count() == 100)
  }

  test("filters and projection push down to the remote scan") {
    val df = Jdbc.read(spark, url, "metrics", props = props)
      .filter(col("SCORE") > 120.0).select("ID", "SCORE")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(SCORE,120.0)"),
      s"filter not pushed:\n$plan")
    // 1.5*i > 120 <=> i > 80
    assert(df.count() == 20)
  }

  test("dynamic DDL + batched write roundtrip (the sql-writer shape)") {
    import org.apache.spark.sql.types._
    val df = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .limit(200)
    // DDL generated from the frame's schema must be executable DDL
    val ddl = Jdbc.createTableDdl("orders_out", df.schema, varcharLen = 32)
    assert(ddl == "CREATE TABLE orders_out (o_orderkey BIGINT, o_custkey BIGINT, " +
      "o_orderstatus VARCHAR(32), o_totalprice DOUBLE PRECISION)")
    // BooleanType has no portable spelling: the dialect picks it
    assert(Jdbc.sqlTypeFor(BooleanType) == "BOOLEAN" &&
      Jdbc.sqlTypeFor(BooleanType, booleanDdl = "BIT") == "BIT")
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(ddl)
    conn.close()

    Jdbc.write(df, url, "orders_out", mode = "append", batchSize = 50, props = props)
    val back = Jdbc.read(spark, url, "orders_out", props = props)
    assert(back.count() == 200)
    // value fidelity through write+read
    val a = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getDouble(3))).toSet
    val b = back.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
      r.getDouble(3))).toSet
    assert(a == b)
    // unmappable types fail loudly, never silently stringified
    intercept[IllegalArgumentException] {
      Jdbc.sqlTypeFor(ArrayType(LongType))
    }
  }

  test("streaming jdbc sink: micro-batches land once, batch retry is idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.types._
    import graft.streaming.JdbcSink
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("amount", DoubleType)))
    val ddl = Jdbc.createTableDdl("stream_out",
      StructType(schema.fields :+ StructField("batch_id", LongType)))
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(ddl); conn.close()

    val in = MemoryStream[(Long, Double)](spark)
    val chk = Files.createTempDirectory("graft_jdbc_chk").toString
    val q = JdbcSink.start(in.toDF().toDF("event_id", "amount"),
      url, "stream_out", chk, props)
    in.addData((1L, 10.0), (2L, 20.0))
    q.processAllAvailable()
    in.addData((3L, 30.0))
    q.processAllAvailable()
    q.stop()

    def rows() = Jdbc.read(spark, url, "stream_out", props = props)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val first = rows()
    assert(first.map(_._1) == Set(1L, 2L, 3L))
    assert(first.map(_._3).size == 2, s"expected 2 batch ids: $first")

    // a retried batch (failure replay) must not duplicate: re-run batch 1
    val replay = Seq((3L, 30.0)).toDF("event_id", "amount")
    JdbcSink.writeBatch(replay, 1L, url, "stream_out", props)
    assert(rows() == first, "batch retry duplicated rows")
  }

  test("writeBatch carries credentials on BOTH the DELETE and the insert") {
    import org.apache.spark.sql.types._
    import graft.streaming.JdbcSink
    import spark.implicits._
    // a Derby database with BUILTIN authentication REQUIRED: any
    // connection opened without user/password fails, so this proves the
    // idempotency DELETE uses the caller's props, not a bare url
    val dir = Files.createTempDirectory("graft_derby_auth").toString
    val bootUrl = s"jdbc:derby:$dir/authdb;create=true"
    val boot = DriverManager.getConnection(bootUrl)
    val st = boot.createStatement()
    Seq(
      "'derby.connection.requireAuthentication', 'true'",
      "'derby.authentication.provider', 'BUILTIN'",
      "'derby.user.app', 'secret'").foreach { kv =>
      st.execute(s"CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY($kv)")
    }
    st.execute("CREATE TABLE auth_out (event_id BIGINT, amount DOUBLE PRECISION, batch_id BIGINT)")
    st.close(); boot.close()
    // auth takes effect on next boot: shut the database down
    intercept[java.sql.SQLException] {
      DriverManager.getConnection(s"jdbc:derby:$dir/authdb;shutdown=true")
    }

    val authUrl = s"jdbc:derby:$dir/authdb"
    val creds = props ++ Map("user" -> "app", "password" -> "secret")
    // credential-less access is really rejected (the trap the fix closes)
    intercept[java.sql.SQLException] { DriverManager.getConnection(authUrl) }

    val batch = Seq((1L, 10.0), (2L, 20.0)).toDF("event_id", "amount")
    JdbcSink.writeBatch(batch, 7L, authUrl, "auth_out", creds)
    // retry of the same batch must pass through the authenticated DELETE
    JdbcSink.writeBatch(batch, 7L, authUrl, "auth_out", creds)
    val back = Jdbc.read(spark, authUrl, "auth_out", props = creds)
    assert(back.count() == 2, "authenticated retry duplicated or dropped rows")
  }

  test("pushed-query mode runs the SQL in the database") {
    val agg = Jdbc.readQuery(spark, url,
      "SELECT site, count(*) AS n FROM metrics GROUP BY site", props)
      .collect()
      .map(r => r.getString(0) -> r.getAs[Number](r.fieldIndex("N")).longValue).toMap
    assert(agg == Map("site_0" -> 25L, "site_1" -> 25L, "site_2" -> 25L, "site_3" -> 25L))
  }

  test("pushed aggregate: Spark scans only the DB-aggregated rows, no Spark-side agg") {
    // the kusto-reader shape (spark_read_kusto.py): the remote engine
    // runs the aggregation; Spark must see 4 group rows, not 100 facts
    val df = Jdbc.readQuery(spark, url,
      "SELECT site, count(*) AS n FROM metrics GROUP BY site", props)
    assert(df.collect().length == 4)
    val plan = df.queryExecution.executedPlan
    assert(!plan.toString.contains("Aggregate"),
      s"GROUP BY re-ran in Spark instead of the database:\n$plan")
    val scanRows = plan.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec =>
        s.metrics("numOutputRows").value
    }
    assert(scanRows == Seq(4L),
      s"scan emitted $scanRows rows — the aggregate was not pushed (fact table has 100)")
  }
}
