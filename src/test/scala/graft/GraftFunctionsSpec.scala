package graft

import org.apache.spark.sql.SparkSession

/** The pure-SQL function surface: imperative registration and the
  * `spark.sql.extensions` route. */
class GraftFunctionsSpec extends SparkSpec {

  test("registerAll exposes native expressions to spark.sql") {
    val s = spark.newSession()
    GraftFunctions.registerAll(s)
    val got = s.sql(
      """SELECT graft_long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dot,
        |       graft_quantize(array(CAST(1.5 AS FLOAT))) AS q,
        |       graft_adc_sum(array(array(7L), array(9L)), array(0, 0)) AS adc
        |""".stripMargin).head()
    assert(got.getLong(0) == 32L)
    assert(got.getSeq[Long](1) == Seq(1500L))
    assert(got.getLong(2) == 16L)
  }

  test("quantize of a vector holding a null element is null, not garbage") {
    val s = spark.newSession()
    GraftFunctions.registerAll(s)
    val got = s.sql(
      """SELECT graft_quantize(array(CAST(1.5 AS FLOAT), CAST(NULL AS FLOAT))) AS q,
        |       graft_quantize_unit(array(CAST(NULL AS DOUBLE))) AS qu
        |""".stripMargin).head()
    assert(got.isNullAt(0))
    assert(got.isNullAt(1))
  }

  test("contentHash separates nearby payloads and is deterministic") {
    import graft.functions.Native.contentHash
    val a = Seq(Seq(1L, 2L), Seq(3L, 4L))
    assert(contentHash(a) == contentHash(Seq(Seq(1L, 2L), Seq(3L, 4L))))
    assert(contentHash(a) != contentHash(Seq(Seq(1L, 2L, 3L), Seq(4L))))   // same flat values
    assert(contentHash(a, 2) != contentHash(a, 3))                          // nprobe matters
    assert(contentHash(a).matches("[0-9a-f]{40}"))
  }

  test("GraftExtensions injects functions via the spark.sql.extensions route") {
    val prev = SparkSession.getDefaultSession
    // getOrCreate reuses the default session and would ignore extensions;
    // clear, build an extension-bearing session on the SAME SparkContext,
    // then restore the shared suite session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val dot = s.sql(
        "SELECT graft_long_array_dot(array(2L, 3L), array(10L, 10L)) AS d")
        .head().getLong(0)
      assert(dot == 50L)

      // the injected optimizer rule rewrites the textbook HOF dot
      // product to the compiled expression — plan AND value. The
      // vectors must come from a non-foldable SOURCE: over literals or
      // a local relation the optimizer evaluates the whole projection
      // before user rules see it (which is fine — nothing left to
      // speed up)
      import org.apache.spark.sql.types._
      import org.apache.spark.sql.Row
      val vecDir = java.nio.file.Files.createTempDirectory("graftvec")
        .resolve("v.parquet").toString
      val vecSchema = StructType(Seq(
        StructField("a", ArrayType(LongType, containsNull = true)),
        StructField("b", ArrayType(LongType, containsNull = true)),
        StructField("tag", StringType)))
      s.createDataFrame(
        java.util.Arrays.asList(
          Row(Seq(2L, 3L, 4L), Seq(5L, 6L, 7L), "clean"),
          Row(Seq[Any](1L, null, 3L), Seq(1L, 1L, 1L), "holed")),
        vecSchema)
        .write.parquet(vecDir)
      s.read.parquet(vecDir).createOrReplaceTempView("__vecs")
      def fired(q: org.apache.spark.sql.DataFrame): Boolean =
        q.queryExecution.optimizedPlan.expressions.exists(
          _.exists(_.isInstanceOf[graft.functions.LongArrayDot]))
      val hof = s.sql(
        """SELECT tag, aggregate(zip_with(a, b, (x, y) -> x * y), 0L,
          |  (acc, v) -> acc + v) AS d FROM __vecs""".stripMargin)
      assert(fired(hof), "RewriteDotProduct must fire on the canonical pattern")
      val rows = hof.collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      assert(rows("clean") == Some(2 * 5 + 3 * 6 + 4 * 7))
      // null element: the null-aware compiled mode must preserve the
      // HOF form's NULL propagation
      assert(rows("holed").isEmpty,
        "a null element must yield NULL, exactly like the HOF form")

      // near-miss shapes must NOT rewrite: wrong init, non-sum merge
      val wrongInit = s.sql(
        """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 1L,
          |  (acc, v) -> acc + v) AS d FROM __vecs WHERE tag = 'clean'""".stripMargin)
      assert(!fired(wrongInit))
      assert(wrongInit.head().getLong(0) == 57L)
      val nonSum = s.sql(
        """SELECT aggregate(zip_with(a, b, (x, y) -> x * y), 0L,
          |  (acc, v) -> acc + v + 1L) AS d FROM __vecs WHERE tag = 'clean'""".stripMargin)
      assert(!fired(nonSum))
    } finally {
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
