package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.NeuralWindows

/** Supervised window frames: count, leakage, normalization constants. */
class NeuralWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def dense(t: Int, key: String = "k") =
    (1 to t).map { i =>
      (key, Date.valueOf(f"2024-01-${i}%02d"), if (i % 3 == 0) 0L else 1L,
        i.toLong * 100)
    }.toDF("key", "day", "n_events", "cents")

  test("window count is T - L - h + 1 per series; short series yield none") {
    val f = NeuralWindows.frames(dense(20), "key", "day", "cents",
      "n_events", inputLen = 5, horizon = 3)
    assert(f.count() === (20 - 5 - 3 + 1).toLong)
    val short = NeuralWindows.frames(dense(7), "key", "day", "cents",
      "n_events", inputLen = 5, horizon = 3)
    assert(short.count() === 0L)
  }

  test("no future leakage: every target day is strictly after every input day") {
    val f = NeuralWindows.frames(dense(20), "key", "day", "cents",
      "n_events", inputLen = 5, horizon = 3).collect()
    f.foreach { r =>
      val inEnd = r.getAs[Date]("input_end_day")
      val tgtStart = r.getAs[Date]("target_start_day")
      val tgtEnd = r.getAs[Date]("target_end_day")
      assert(inEnd.before(tgtStart), "target must start after input ends")
      assert(tgtStart.toLocalDate === inEnd.toLocalDate.plusDays(1),
        "target is contiguous with the input on the dense spine")
      assert(tgtEnd.toLocalDate === tgtStart.toLocalDate.plusDays(2))
    }
  }

  test("normalization constants are exact: sum and observed-day count per window") {
    // cents = 100·i, obs iff i % 3 != 0; window 1 covers days 1..5
    val f = NeuralWindows.frames(dense(20), "key", "day", "cents",
      "n_events", inputLen = 5, horizon = 3)
      .orderBy("window_id").collect()
    val w1 = f.head
    assert(w1.getAs[Long]("input_sum_cents") === 100L * (1 + 2 + 3 + 4 + 5))
    assert(w1.getAs[Long]("input_obs_days") === 4L) // day 3 has no events
    assert(w1.getAs[Long]("target_sum_cents") === 100L * (6 + 7 + 8))
    // last window ends exactly at T
    val wLast = f.last
    assert(wLast.getAs[Date]("target_end_day") ===
      Date.valueOf("2024-01-20"))
  }

  test("plan shape: one exchange — all window frames share the per-key sort") {
    val f = NeuralWindows.frames(dense(20), "key", "day", "cents",
      "n_events", inputLen = 5, horizon = 3)
    val plan = f.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges === 1,
      s"expected exactly one shuffle (hash by key), plan:\n$plan")
    // lead() and both ROWS BETWEEN sums must ride one Window operator
    // family over the same (key, day) sort — no re-sort between them
    val sorts = "Sort ".r.findAllIn(plan).length
    assert(sorts <= 2, s"window frames re-sorting, plan:\n$plan")
  }

  test("two keys window independently") {
    val two = dense(12, "a").union(dense(9, "b"))
    val f = NeuralWindows.frames(two, "key", "day", "cents", "n_events",
      inputLen = 4, horizon = 2)
    val byKey = f.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byKey === Map("a" -> (12 - 4 - 2 + 1).toLong,
      "b" -> (9 - 4 - 2 + 1).toLong))
  }
}
