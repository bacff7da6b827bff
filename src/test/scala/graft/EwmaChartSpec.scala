package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.EwmaChart

/** EWMA chart: constant series hits the exact truncated-horizon value,
  * incomplete horizons are NULL, spikes alert, gated shape holds. */
class EwmaChartSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  private def series(counts: Seq[Int]): Seq[(String, Timestamp)] =
    counts.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n)(("t", ts(i + 1)))
    }

  // exact truncated-horizon EWMA of a constant x: x·(4^16 − 3^16)/4^16
  private def constEwma(x: Long): Long =
    (BigInt(1000000) * x * (BigInt(4).pow(16) - BigInt(3).pow(16)) /
      BigInt(4).pow(16)).toLong

  test("constant series: exact geometric value from day 16, NULL before") {
    val out = EwmaChart.chart(series(Seq.fill(20)(8)).toDF("event_type", "ts"),
      "event_type", "ts").orderBy("day").collect()
    assert(out.length === 20)
    (0 until 15).foreach(i => assert(out(i).isNullAt(3), s"day $i"))
    (15 until 20).foreach { i =>
      assert(out(i).getAs[Long]("ewma_permicro") === constEwma(8L), s"day $i")
    }
    // a constant series never alerts once the line exists
    (16 until 20).foreach(i => assert(!out(i).getAs[Boolean]("alert")))
  }

  test("a spike day breaks >25% from yesterday's line and alerts") {
    val out = EwmaChart.chart(
      series(Seq.fill(19)(8) :+ 100).toDF("event_type", "ts"),
      "event_type", "ts").orderBy("day").collect()
    val spike = out.last
    assert(spike.getAs[Long]("x") === 100L)
    assert(spike.getAs[Boolean]("alert"))
  }

  test("missing days densify to x = 0 in the spine") {
    val df = Seq(("t", ts(1)), ("t", ts(3))).toDF("event_type", "ts")
    val out = EwmaChart.chart(df, "event_type", "ts").orderBy("day").collect()
    assert(out.length === 3)
    assert(out(1).getAs[Long]("x") === 0L)
  }

  test("gated instance: 5 types x full calendar, line appears from day 16") {
    val out = EwmaChart.ewmaEvents(spark, sfDir)
    val types = out.select("event_type").distinct().count()
    assert(types === 5L)
    val withLine = out.filter(col("ewma_permicro").isNotNull)
    assert(withLine.count() > 0L)
    assert(out.filter(col("x") < 0L).count() === 0L)
  }
}
