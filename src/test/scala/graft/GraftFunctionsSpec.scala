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
    } finally {
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
