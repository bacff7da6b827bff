package graft

import org.apache.spark.sql.functions._
import graft.operators.{Changepoint, Ranks, SessionPaths}
import graft.functions.{NgramStats, Vocab}
import graft.ml.LinReg

/** Round-13 continuation operators: CUSUM changepoint, vocab coverage,
  * skip-gram pairs, quantile-rank transform, first-k session paths, and
  * normal-equation linear regression. Planted-data semantics here;
  * cross-engine equality is the DuckDB hash gate. */
class Round13bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(day: Int, n: Int): Seq[(String, String, Double)] =
    Seq.fill(n)(("a", f"2024-01-$day%02d 12:00:00", 1.0))

  test("changepoint: level shift 1,1,1 -> 9,9,9 cuts after day 3 with exact side means") {
    val df = (ev(1, 1) ++ ev(2, 1) ++ ev(3, 1) ++ ev(4, 9) ++ ev(5, 9) ++ ev(6, 9))
      .toDF("k", "ts_s", "v").withColumn("ts", to_timestamp(col("ts_s")))
    val r = Changepoint.cusumDailyCounts(df, "k", "ts", "v").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_days") == 6L)
    assert(row.getAs[Long]("total_events") == 30L)
    // n*prefix - k*total peaks at |6*3 - 3*30| = 72 on day 3
    assert(row.getAs[java.sql.Date]("cp_day").toString == "2024-01-03")
    assert(row.getAs[Long]("cp_k") == 3L)
    assert(row.getAs[Long]("cusum_abs") == 72L)
    assert(row.getAs[Long]("mean_before_micros") == 1000000L) // 3 events / 3 days
    assert(row.getAs[Long]("mean_after_micros") == 9000000L)  // 27 / 3
  }

  test("changepoint: constant series has all-zero cusum and tie-breaks to the first day") {
    val df = (ev(1, 2) ++ ev(2, 2) ++ ev(3, 2))
      .toDF("k", "ts_s", "v").withColumn("ts", to_timestamp(col("ts_s")))
    val row = Changepoint.cusumDailyCounts(df, "k", "ts", "v").collect().head
    assert(row.getAs[Long]("cusum_abs") == 0L)
    assert(row.getAs[Long]("cp_k") == 1L)
  }

  test("vocab coverage: top-V tie at the boundary resolves by token order") {
    val docs = Seq((1L, "aa aa bb"), (2L, "aa cc")).toDF("id", "text")
    // counts: aa=3, bb=1, cc=1 -> top-2 under (c DESC, t ASC) = {aa, bb}
    val got = Vocab.oovCoverage(docs, "id", "text", v = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Long]("oov_permille"))).toMap
    assert(got(1L) == ((3L, 0L, 0L)))
    assert(got(2L) == ((2L, 1L, 500L))) // cc lost the tie to bb
  }

  test("skipgram pairs: window 3 enumerates ordered pairs; short docs contribute none") {
    val docs = Seq((1L, "x y z w"), (2L, "solo")).toDF("id", "text")
    val got = NgramStats.skipgramPairs(docs, "id", "text", w = 3, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val want = Seq("x" -> "y", "x" -> "z", "x" -> "w",
      "y" -> "z", "y" -> "w", "z" -> "w").map(_ -> 1L).toMap
    assert(got == want)
  }

  test("rank transform: ties share a ppm and the top value maps to exactly 1e6") {
    val df = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 30L)).toDF("id", "v")
    val got = Ranks.rankTransform(df, col("v"), "ppm")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("ppm")).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 666666L, 4L -> 1000000L))
  }

  test("session paths: total order (ts, id) fixes step order; short journeys keep a short path") {
    val df = Seq(
      // u1: tie at t=100 broken by id (2 before 5) -> v>c>p, 4th event ignored
      (2L, 1L, "v", 100L), (5L, 1L, "c", 100L), (7L, 1L, "p", 200L),
      (9L, 1L, "v", 300L),
      // u2: two events only
      (1L, 2L, "v", 50L), (3L, 2L, "c", 60L))
      .toDF("id", "user", "typ", "t")
      .withColumn("ts", timestamp_micros(col("t")))
    val got = SessionPaths.firstKPaths(df, "user", "ts", "id", "typ", k = 3)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_actors"), r.getAs[Long]("n_full"))).toMap
    assert(got == Map("v>c>p" -> ((1L, 1L)), "v>c" -> ((1L, 0L))))
  }

  test("linreg: exact plane y = 2 + 3x1 + 5x2 is recovered to the micro") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (4L, 2L))
    val df = pts.map { case (x1, x2) => (2L + 3 * x1 + 5 * x2, x1, x2) }
      .toDF("y", "x1", "x2")
    val row = LinReg.fitTwoFeature(df, col("y"), col("x1"), col("x2"),
      probeX1 = 30L, probeX2 = 5L).collect().head
    assert(row.getAs[Long]("n") == 6L)
    assert(row.getAs[Long]("b0_micros") == 2000000L)
    assert(row.getAs[Long]("b1_micros") == 3000000L)
    assert(row.getAs[Long]("b2_micros") == 5000000L)
    assert(row.getAs[Long]("yhat_probe_micros") == 117000000L)
  }

  test("linreg: collinear features yield NULL coefficients, not garbage") {
    // x2 = 2*x1 everywhere -> Gram matrix is singular
    val df = Seq((1L, 1L, 2L), (5L, 2L, 4L), (9L, 3L, 6L))
      .toDF("y", "x1", "x2")
    val row = LinReg.fitTwoFeature(df, col("y"), col("x1"), col("x2"), 1L, 1L)
      .collect().head
    assert(row.isNullAt(row.fieldIndex("b0_micros")))
    assert(row.isNullAt(row.fieldIndex("b1_micros")))
    assert(row.isNullAt(row.fieldIndex("b2_micros")))
  }
}
