package graft

import org.apache.spark.sql.functions._
import graft.operators.{Changepoint, Intervals, QuantileNormalize, RankMetrics, Ranks, SessionPaths}
import graft.functions.{NgramStats, Vocab}
import graft.ml.LinReg
import graft.ann.PcaPowerStep

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

  test("interval islands: overlaps merge, half-open back-to-back stays split") {
    val iv = Seq(("k1", 0L, 10L), ("k1", 5L, 15L), ("k1", 20L, 30L),
      ("k1", 30L, 40L), ("k2", 1L, 2L))
      .toDF("k", "s", "e")
    val got = Intervals.mergeIslands(iv, "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // k1: [0,10)+[5,15) merge; [20,30) and [30,40) touch only at 30
    assert(got == Map(("k1", 0L) -> ((15L, 2L)), ("k1", 20L) -> ((30L, 1L)),
      ("k1", 30L) -> ((40L, 1L)), ("k2", 1L) -> ((2L, 1L))))
  }

  test("glove cooccur: same pair at mixed distances sums exact per-distance micros") {
    val docs = Seq((1L, "a b a b")).toDF("id", "text")
    val got = NgramStats.gloveCooccur(docs, "id", "text", w = 3, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // (a,b): d=1 (pos1-2), d=3 (pos1-4), d=1 (pos3-4) -> 1e6+333333+1e6
    assert(got(("a", "b")) == ((3L, 2333333L)))
    assert(got(("a", "a")) == ((1L, 500000L))) // d=2
    assert(got(("b", "a")) == ((1L, 1000000L)))
    assert(got(("b", "b")) == ((1L, 500000L)))
  }

  test("quantile normalize: groups map onto global order stats; singleton goes to the median") {
    val df = Seq((1L, "A", 1L), (2L, "A", 2L), (3L, "A", 3L),
      (4L, "B", 10L), (5L, "B", 20L), (6L, "B", 30L), (7L, "C", 100L))
      .toDF("id", "grp", "v")
    val got = QuantileNormalize.quantileNormalize(df, "grp", col("v"), "qn")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("qn")).toMap
    // global sorted: [1,2,3,10,20,30,100], N=7; within-group p in {0,1/2,1}
    // -> gidx {0, 3, 6} for both 3-row groups; singleton C -> (N-1) div 2 = 3
    assert(got == Map(1L -> 1L, 2L -> 10L, 3L -> 100L,
      4L -> 1L, 5L -> 10L, 6L -> 100L, 7L -> 10L))
  }

  test("pca power step: hand-computed n²-covariance times ones on exact binary fractions") {
    val df = Seq((1L, Array(0.25f, 0.5f)), (2L, Array(0.75f, 1.0f)),
      (3L, Array(1.25f, 3.0f))).toDF("vec_id", "embedding")
    val got = PcaPowerStep.powerStep(df, "embedding")
      .collect().map(r => r.getAs[Long]("dim") ->
        (r.getAs[Long]("n_points"), r.getAs[Long]("sum_milli"),
          r.getAs[Long]("var_n2"), r.getAs[Long]("cv1"))).toMap
    // millis (250,500),(750,1000),(1250,3000); row sums 750,1750,4250; T=6750
    assert(got(0L) == ((3L, 2250L, 1500000L, 5250000L)))
    assert(got(1L) == ((3L, 4500L, 10500000L, 14250000L)))
  }

  test("pca power step2: rescaled iterate feeds step 2 and concentrates on the dominant axis") {
    // variance dominated by dim 0; dims are centered (S = 0) so
    // cv1_j = n*sum(x_j*rowsum) exactly; all values binary-exact floats
    val df = Seq(
      (1L, Array(2.0f, 0.5f, 0.0f)), (2L, Array(-2.0f, -0.5f, 0.0f)),
      (3L, Array(2.0f, -0.5f, 0.0f)), (4L, Array(-2.0f, 0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = PcaPowerStep.powerStep2(df, "embedding")
      .collect().map(r => r.getAs[Long]("dim") ->
        (r.getAs[Long]("v1"), r.getAs[Long]("cv2"))).toMap
    // hand-computed: cv1 = (64e6, 4e6, 0) -> v1 = (500, 31, 0);
    // p = (1015500, -1015500, 984500, -984500) -> cv2 below
    assert(got(0L) == ((500L, 32000000000L)))
    assert(got(1L) == ((31L, 124000000L)))
    assert(got(2L) == ((0L, 0L)))
    // two steps concentrate harder than one: 258x vs 16x dominance
    assert(got(0L)._2 / got(1L)._2 > 250L)
  }

  test("ranking metrics: hand-computed nDCG@3/MRR/P@3; no-relevant group gets NULL ndcg") {
    val df = Seq(
      ("g1", 1L, 100L, 0L), ("g1", 2L, 90L, 3L), ("g1", 3L, 80L, 2L),
      ("g1", 4L, 70L, 0L), ("g1", 5L, 60L, 1L),
      ("g2", 6L, 50L, 0L), ("g2", 7L, 40L, 0L))
      .toDF("g", "item", "score", "rel")
    val rows = RankMetrics.rankingMetrics(df, "g", "item", "score", "rel",
      k = 3, relevant = 2).collect().map(r => r.getString(0) -> r).toMap
    val g1 = rows("g1")
    // discounts [1e6, 630930, 500000]; model order 1,2,3: rel 0,3,2
    assert(g1.getAs[Long]("dcg_micros") == 3L * 630930 + 2L * 500000)
    assert(g1.getAs[Long]("idcg_micros") == 3L * 1000000 + 2L * 630930 + 1L * 500000)
    assert(g1.getAs[Long]("ndcg_permicro") == 607491L)
    assert(g1.getAs[Long]("rr_micros") == 500000L)     // first rel>=2 at pos 2
    assert(g1.getAs[Long]("prec_at_k_permicro") == 666666L) // 2 hits in top 3
    val g2 = rows("g2")
    assert(g2.isNullAt(g2.fieldIndex("ndcg_permicro")))
    assert(g2.getAs[Long]("rr_micros") == 0L)
    assert(g2.getAs[Long]("prec_at_k_permicro") == 0L)
  }

  test("LongArraySum equals the aggregate-HOF definition, negatives and empties included") {
    val df = Seq(
      (1L, Array(1L, 2L, 3L)), (2L, Array(-5L, 5L, -7L)),
      (3L, Array.empty[Long]), (4L, Array(Long.MaxValue / 2, Long.MaxValue / 2)))
      .toDF("id", "xs")
    val got = df.select(col("id"),
        graft.functions.VectorFunctions.sumQ(col("xs")).as("s"),
        aggregate(col("xs"), lit(0L), (a, x) => a + x).as("ref"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), s"row ${r.getLong(0)}"))
  }

  test("cusum monitor: evidence accumulates across micro-batches; alarms reset the side") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.CusumMonitor
    import graft.streaming.CusumMonitor.{Alarm, Obs}
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Obs]
    val chk = java.nio.file.Files.createTempDirectory("graft_cusum_chk").toString
    // mu0 = 10.0, slack 1.0, threshold 5.0 (all micros)
    val q = CusumMonitor.alarms(in.toDS(), 10000000L, 1000000L, 5000000L)
      .writeStream.outputMode("append").format("memory")
      .queryName("cusum_alarms").option("checkpointLocation", chk).start()
    def obs(id: Long, v: Double): Obs =
      Obs("k", new java.sql.Timestamp(1700000000000L + id * 1000), id, (v * 1e6).toLong)
    in.addData((1L to 3L).map(obs(_, 10.0)): _*)   // in control
    q.processAllAvailable()
    in.addData((4L to 9L).map(obs(_, 11.5)): _*)   // +0.5e6/obs -> hi = 3e6
    q.processAllAvailable()
    in.addData((10L to 14L).map(obs(_, 11.5)): _*) // crosses 5e6 at obs 14
    q.processAllAvailable()
    in.addData((15L to 17L).map(obs(_, 7.0)): _*)  // low side: +2e6/obs
    q.processAllAvailable()
    q.stop()
    import spark.implicits._
    val alarms = spark.table("cusum_alarms").as[Alarm].collect().sortBy(_.event_id)
    assert(alarms.length == 2, s"expected 2 alarms: ${alarms.mkString(";")}")
    // sustained small drift alarms only once state spans three batches
    assert(alarms(0) == Alarm("k", alarms(0).ts, 14L, "high", 5500000L, 14L))
    assert(alarms(1) == Alarm("k", alarms(1).ts, 17L, "low", 6000000L, 3L))
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
