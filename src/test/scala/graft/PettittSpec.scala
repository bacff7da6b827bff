package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Changepoint

/** Pettitt via the value-cell identity must equal the O(n²) textbook
  * definition exactly, locate a planted rank shift, and stay
  * transform-invariant (rank test). */
class PettittSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")

  private def frame(ys: Seq[Double]) =
    ys.zipWithIndex.map { case (y, d) => ("a", ts(d), y) }
      .toDF("event_type", "ts", "value")

  /** Textbook U_k = Σ_{i≤k} Σ_{j>k} sign(x_j − x_i). */
  private def naiveU(xs: Seq[Long]): Seq[Long] =
    (1 until xs.length).map { k =>
      (for (i <- 0 until k; j <- k until xs.length)
        yield math.signum(xs(j) - xs(i)).toLong).sum
    }

  test("cell identity equals the O(n²) definition, ties included") {
    val ys = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0)
    val xs = ys.map(y => math.round(y * 100))
    val us = naiveU(xs).map(math.abs)
    val expectK = us.indexOf(us.max) + 1
    val r = Changepoint.pettittDaily(frame(ys), "event_type", "ts", "value")
      .collect().head
    assert(r.getAs[Long]("u_abs") == us.max,
      s"U must match the textbook max: got $r want ${us.max} (us=$us)")
    assert(r.getAs[Long]("cp_k") == expectK.toLong,
      s"argmax position must match (ties earliest): $r")
  }

  test("a planted level shift is located at the boundary") {
    val ys = Seq.fill(10)(1.0) ++ Seq.fill(10)(100.0)
    val r = Changepoint.pettittDaily(frame(ys), "event_type", "ts", "value")
      .collect().head
    assert(r.getAs[Long]("cp_k") == 10L)
    // clean split: every cross pair is +1 ⇒ U = 10·10
    assert(r.getAs[Long]("u_abs") == 100L)
    assert(r.getAs[Long]("p_micro") < 50000L,
      s"a clean 10+10 shift is significant: $r")
  }

  test("rank invariance: a monotone transform changes nothing") {
    val ys = Seq(1.0, 5.0, 2.0, 8.0, 3.0, 100.0, 120.0, 110.0, 130.0, 140.0)
    val a = Changepoint.pettittDaily(frame(ys), "event_type", "ts", "value")
      .select("cp_k", "u_abs").collect().head
    val b = Changepoint.pettittDaily(frame(ys.map(y => y * y)),
      "event_type", "ts", "value").select("cp_k", "u_abs").collect().head
    assert(a == b, s"rank test must ignore monotone transforms: $a vs $b")
  }

  test("gated instance: one row per event type, p in [0, 1e6]") {
    val out = Changepoint.pettittEvents(spark, sfDir).localCheckpoint()
    assert(out.count() ==
      Tables.events(spark, sfDir).select("event_type").distinct().count())
    assert(out.filter(col("p_micro") < 0 || col("p_micro") > 1000000L)
      .count() == 0)
  }
}
