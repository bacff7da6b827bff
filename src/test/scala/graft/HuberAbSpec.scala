package graft

import org.apache.spark.sql.functions._
import graft.ml.HuberStep
import graft.operators.Bootstrap

class HuberAbSpec extends SparkSpec {
  import spark.implicits._

  test("huber: one step pulls the slope back toward the clean trend") {
    // clean line y = 10x plus one massive outlier dragging OLS up
    val clean = (1L to 50L).map(i => (i % 10 + 1, (i % 10 + 1) * 10))
    val df = (clean :+ ((5L, 100000L))).toDF("x", "y")
    val r = HuberStep.irlsStep(df, "x", "y", kMicros = 50L * 1000000L)
      .select($"slope0_micros", $"slope1_micros", $"n_downweighted")
      .as[(Long, Long, Long)].head()
    val err0 = math.abs(r._1 - 10000000L)
    val err1 = math.abs(r._2 - 10000000L)
    assert(r._3 >= 1L)          // the outlier was downweighted
    assert(err1 < err0 / 5, s"slope0 ${r._1} slope1 ${r._2}")
  }

  test("huber: outlier-free data keeps full weights, slope unchanged") {
    val df = (1L to 20L).map(i => (i, i * 7)).toDF("x", "y")
    val r = HuberStep.irlsStep(df, "x", "y", kMicros = 1000L * 1000000L)
      .select($"slope0_micros", $"slope1_micros", $"n_downweighted")
      .as[(Long, Long, Long)].head()
    assert(r._3 === 0L)
    assert(r._1 === 7000000L && r._2 === 7000000L)
  }

  test("huber gated instance: one row, both fits solved") {
    val r = HuberStep.huberLineitem(spark, sfDir)
      .select($"n", $"slope1_micros").as[(Long, Option[Long])].collect()
    assert(r.length === 1 && r.head._1 > 0 && r.head._2.isDefined)
  }

  test("bootstrap ab: identical arms give a CI straddling zero") {
    // same distribution both arms (value = id % 5)
    val df = (1L to 2000L).map(i =>
      (i, i % 5, if (i % 2 == 0) "a" else "b")).toDF("id", "v", "arm")
    val r = Bootstrap.diffCi(df, "id", "v", "arm", "a", "b")
      .select($"diff_micro", $"ci_lo_micro", $"ci_hi_micro")
      .as[(Long, Long, Long)].head()
    assert(r._2 <= 0L && r._3 >= 0L, s"CI [${r._2}, ${r._3}]")
    assert(r._2 <= r._1 && r._1 <= r._3)
  }

  test("bootstrap ab: a planted lift is detected (CI excludes zero)") {
    val df = (1L to 2000L).map(i =>
      (i, (i % 5) + (if (i % 2 == 0) 100L else 0L),
        if (i % 2 == 0) "a" else "b")).toDF("id", "v", "arm")
    val r = Bootstrap.diffCi(df, "id", "v", "arm", "a", "b")
      .select($"ci_lo_micro").as[Long].head()
    assert(r > 50L * 1000000L) // lower bound far above zero
  }
}
