package graft

import org.apache.spark.sql.functions._
import graft.operators.{BehaviorStats, DigitProfile, Hierarchy}

/** Markov transitions, power-of-two decay, Benford profiling, and the
  * hierarchy subtree rollup — planted-data semantics. */
class BehaviorStatsSpec extends SparkSpec {
  import spark.implicits._

  test("markov transitions: ordered pairs per user, row-normalized probabilities") {
    // user 1: a->b->a; user 2: a->c. From 'a': b once, c once (50/50).
    val ev = Seq((1L, 1L, 1L, "a"), (2L, 1L, 2L, "b"), (3L, 1L, 3L, "a"),
      (4L, 2L, 1L, "a"), (5L, 2L, 2L, "c"))
      .toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros($"us"))
    val got = BehaviorStats.markovTransitions(ev, "user_id", "ts",
        "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(("a", "b") -> ((1L, 500000L)), ("a", "c") -> ((1L, 500000L)),
      ("b", "a") -> ((1L, 1000000L))))
    // the last event of each user emits no pair: 3 transitions from 5 rows
    assert(got.values.map(_._1).sum == 3L)
  }

  test("decayed value: exact halving per elapsed half-life, capped") {
    val day = 86400000000L
    // anchor = newest event (user 2's). user 1: 8.00 at anchor-7d (one
    // halving -> 400), 8.00 at anchor-14d (two -> 200), 0.04 at
    // anchor-63d (nine halvings -> 0 by integer division)
    val ev = Seq((1L, 1L, 63L * day, 0.04), (2L, 1L, 7L * day, 8.0),
      (3L, 1L, 14L * day, 8.0), (4L, 2L, 0L * day, 1.0))
      .map { case (id, u, back, v) => (id, u, 100L * day - back, v) }
      .toDF("event_id", "user_id", "us", "value")
      .withColumn("ts", timestamp_micros($"us"))
    val got = BehaviorStats.decayedValue(ev, "user_id", "ts", "value", 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ((3L, 600L)), 2L -> ((1L, 100L))))
  }

  test("decayed value: a negative value fails fast instead of silently diverging") {
    val ev = Seq((1L, 1L, 0L, -0.5))
      .toDF("event_id", "user_id", "us", "value")
      .withColumn("ts", timestamp_micros($"us"))
    val e = intercept[Exception] {
      BehaviorStats.decayedValue(ev, "user_id", "ts", "value", 7).collect()
    }
    assert(e.getMessage.contains("negative") ||
      Option(e.getCause).exists(_.getMessage.contains("negative")))
  }

  test("benford: digits from exact cents, shares and expectations in micros") {
    // cents: 100, 150, 2000, 90 -> digits 1,1,2,9
    val df = Seq(1.0, 1.5, 20.0, 0.9, 0.0).toDF("v") // zero excluded
    val got = DigitProfile.benford(df, "v")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1) == ((2L, 500000L, math.rint(math.log10(2.0) * 1e6).toLong)))
    assert(got(2)._1 == 1L && got(2)._2 == 250000L)
    assert(got(9)._3 == math.rint(math.log10(10.0 / 9.0) * 1e6).toLong)
    assert(got.values.map(_._1).sum == 4L)
  }

  test("subtree rollup: every node's cents reach all ancestors and itself") {
    //   1 -> {11, 12}; 11 -> {111}
    val edges = Seq((1L, None: Option[Long]), (11L, Some(1L)),
      (12L, Some(1L)), (111L, Some(11L))).toDF("child", "parent")
    val vals = Seq((1L, 1L), (11L, 10L), (12L, 100L), (111L, 1000L))
      .toDF("node", "cents")
    val flat = Hierarchy.flatten(edges, "child", "parent")
    val got = Hierarchy.subtreeRollup(flat, vals, "node", "cents")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("1" -> ((4L, 1111L)), "11" -> ((2L, 1010L)),
      "12" -> ((1L, 100L)), "111" -> ((1L, 1000L))))
  }
}
