package graft

import java.sql.Date
import org.apache.spark.sql.functions._

/** Yule-Walker AR(2) on planted series with hand-checkable fits. */
class YuleWalkerSpec extends SparkSpec {
  import spark.implicits._

  private def series(cents: Seq[Long]): org.apache.spark.sql.DataFrame =
    cents.zipWithIndex.map { case (c, i) =>
      (1L, Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)), c)
    }.toDF("key", "day", "cents")

  test("pure AR(1)-like alternating series: phi1 negative, phi2 near -1 complement") {
    // z alternates +a/-a around the mean -> c1 = -c0 + boundary, strong
    // negative phi1; recursion must flip signs step by step
    val ys = Seq.tabulate(20)(i => if (i % 2 == 0) 100L else -100L)
      .map(_ + 500L)
    // horizon 3 over a 23-long series: train = first 20
    val dense = series(ys ++ Seq(400L, 600L, 400L))
    val st = graft.operators.YuleWalker.endState(dense, "key", "day", "cents", holdback = 3)
      .collect()(0)
    val p1 = st.getLong(2)
    assert(p1 < -900000L, s"alternating series must fit strongly negative phi1, got $p1")
  }

  test("hand-exact tiny fit: covariances, clamp and recursion") {
    // train = [10, 20, 10, 20, 10] (T=5, S=70, m=14), z = [-4,6,-4,6,-4]
    // c0 = 16+36+16+36+16 = 120; c1 = -24-24-24-24 = -96; c2 = 16+36+16 = 68...
    // recompute: z1*z3 + z2*z4 + z3*z5 = (-4)(-4) + 6*6 + (-4)(-4) = 68
    // den = 120^2 - 96^2 = 14400 - 9216 = 5184
    // p1 = floor(-96*(120-68)*1e6 / 5184) = floor(-4992e6/5184) = floor(-963000000/...)
    val dense = series(Seq(10L, 20L, 10L, 20L, 10L, 20L, 10L))
    val st = graft.operators.YuleWalker.endState(dense, "key", "day", "cents", holdback = 2)
      .collect()(0)
    assert(st.getLong(1) === 14L, "mean = floor(70/5)")
    val p1 = st.getLong(2); val p2 = st.getLong(3)
    assert(p1 === Math.floorDiv(-4992L * 1000000L, 5184L))
    // p2 = floor((68*120 - 96^2)*1e6/5184) = floor((8160-9216)e6/5184) = floor(-1056e6/5184)
    val p2want = Math.floorDiv(-1056L * 1000000L, 5184L)
    assert(p2 === p2want)
    // last deviations: d1 = z5 = -4, d2 = z4 = 6
    assert(st.getLong(4) === -4L && st.getLong(5) === 6L)
  }

  test("constant series is dropped (no AR information)") {
    val dense = series(Seq.fill(12)(500L))
    assert(graft.operators.YuleWalker.endState(dense, "key", "day", "cents", 3).isEmpty)
  }

  test("short series (T < 4) is dropped") {
    val dense = series(Seq(10L, 30L, 20L, 40L, 10L, 20L))
    // holdback 3 leaves T = 3
    assert(graft.operators.YuleWalker.endState(dense, "key", "day", "cents", 3).isEmpty)
  }

  test("gated instance: every key has 7 eval points and clamped params") {
    val out = graft.operators.YuleWalker.yuleWalkerEvents(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(3) === 7L), "n_eval = horizon")
    assert(out.forall(r => math.abs(r.getLong(1)) <= 2000000L))
    assert(out.forall(r => math.abs(r.getLong(2)) <= 2000000L))
  }
}
