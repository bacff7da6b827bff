package graft

import org.apache.spark.sql.functions._
import graft.operators.{Conformal, Forecast, FreqSketch}

/** Model-adjacent operators: split-conformal calibration, seasonal-naive
  * backtest, Misra-Gries heavy hitters. */
class ModelOpsSpec extends SparkSpec {
  import spark.implicits._

  test("conformal qhat is the ceil((n+1)(1-a))-th smallest cal residual") {
    // 9 cal rows, residuals 10..90; alpha=0.1 -> k = ceil(10*0.9) = 9
    val rows = (1L to 9L).map(i => (i, i * 10L, 0.0, "cal")) ++
      Seq((100L, 50L, 0.0, "val"), (101L, 95L, 0.0, "val"))
    val df = rows.toDF("id", "y", "yhat", "role")
    val got = Conformal.calibrate(df, "id", "y", "yhat",
      calPred = $"role" === "cal", valPred = $"role" === "val", alpha = 0.1)
      .head()
    assert(got.getAs[Long]("k") == 9L)
    assert(got.getAs[Double]("qhat") == 90.0)
    // residuals 50 and 95: only 50 <= 90 -> coverage 1/2
    assert(got.getAs[Long]("covered") == 1L &&
      got.getAs[Double]("coverage") == 0.5)
  }

  test("conformal coverage hits >= 1-alpha on exchangeable data") {
    val r = Conformal.conformalEvents(spark, sfDir).head()
    // split conformal guarantees E[coverage] >= 0.9; on 1k events allow
    // binomial slack but catch gross miscalibration
    assert(r.getAs[Double]("coverage") >= 0.85,
      s"coverage ${r.getAs[Double]("coverage")} badly below 1-alpha")
  }

  test("seasonal-naive backtest forecasts across calendar gaps correctly") {
    val day0 = java.sql.Date.valueOf("2024-03-01").toLocalDate
    def ts(d: Int) = java.sql.Timestamp.valueOf(day0.plusDays(d).atTime(12, 0))
    // user 1: days 0..6 value 1.00, days 7..13 value 3.00 (except day 9
    // missing -> its eval row must drop, not shift)
    val rows = ((0 to 6).map(d => (1L, ts(d), 1.0)) ++
      (7 to 13).filter(_ != 9).map(d => (1L, ts(d), 3.0)))
      .zipWithIndex.map { case ((u, t, v), i) => (i.toLong, u, t, v) }
    val df = rows.toDF("event_id", "user_id", "ts", "value")
    val got = Forecast.seasonalNaiveBacktest(df, "user_id", "ts", "value",
      season = 7, horizon = 7).head()
    // horizon = last 7 observed days: 6,7,8,10,11,12,13. day 6 has no
    // day -1 history; days 7,8,10..13 forecast 100 vs actual 300
    assert(got.getAs[Long]("n_eval") == 6L)
    assert(got.getAs[Double]("mae_cents") == 200.0)
    assert(got.getAs[Double]("bias_cents") == 200.0)
  }

  test("misra-gries: exact at capacity >= cardinality") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .toDF("v")
    val got = FreqSketch.heavyHitters(df, "v", k = 10)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 5L, "b" -> 3L, "c" -> 2L))
  }

  test("misra-gries: support + error bound hold under tight capacity") {
    // N=100: a:60, b:25, 15 singletons; k=4 -> error <= N/(k+1) = 20
    val data = Seq.fill(60)("a") ++ Seq.fill(25)("b") ++
      (1 to 15).map(i => s"rare$i")
    // fixed shuffle for determinism of the test input order
    val shuffled = new scala.util.Random(7).shuffle(data)
    val df = spark.sparkContext.parallelize(shuffled, 8).toDF("v")
    val got = FreqSketch.heavyHitters(df, "v", k = 4)
      .as[(String, Long)].collect().toMap
    val n = 100L
    val err = n / 5
    // any item with true count > N/(k+1) must survive
    assert(got.contains("a") && got.contains("b"))
    // estimates never overshoot truth and undershoot by at most N/(k+1)
    val truth = Map("a" -> 60L, "b" -> 25L).withDefaultValue(1L)
    got.foreach { case (item, est) =>
      assert(est <= truth(item), s"$item overestimated: $est")
      assert(est >= truth(item) - err, s"$item below error bound: $est")
    }
  }
}
