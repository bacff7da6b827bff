package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.apache.spark.sql.functions._
import graft.operators.Concurrent

/** FAIR-pool concurrent runner: result equality with serial execution,
  * genuine thread-level concurrency, and the gated stats entry. */
class ConcurrentSpec extends SparkSpec {

  test("runAll returns results in input order, equal to serial execution") {
    val jobs: Seq[(String, () => Long)] = Seq(
      "orders" -> (() => Tables.orders(spark, sfDir).count()),
      "customer" -> (() => Tables.customer(spark, sfDir).count()),
      "lineitem" -> (() => Tables.lineitem(spark, sfDir).count()))
    val concurrent = Concurrent.runAll(spark, jobs, parallelism = 3)
    val serial = jobs.map { case (n, f) => n -> f() }
    assert(concurrent == serial)
    assert(concurrent.map(_._1) == Seq("orders", "customer", "lineitem"))
  }

  test("jobs genuinely overlap: cross-waiting latches complete") {
    // each job releases the OTHER's latch before awaiting its own: only
    // concurrent execution can finish — serial execution would deadlock
    // (the await below would time out and fail the assertion)
    val a = new CountDownLatch(1)
    val b = new CountDownLatch(1)
    val out = Concurrent.runAll[Boolean](spark, Seq(
      "first" -> (() => { b.countDown(); a.await(30, TimeUnit.SECONDS) }),
      "second" -> (() => { a.countDown(); b.await(30, TimeUnit.SECONDS) })),
      parallelism = 2)
    assert(out == Seq("first" -> true, "second" -> true))
  }

  test("timeout fails loudly, naming the still-pending jobs") {
    import scala.concurrent.duration._
    // one thread, two cross-waiting jobs: the classic under-provisioned
    // deadlock. The timeout must rescue the caller and say who is stuck.
    val gate = new CountDownLatch(1)
    val ex = intercept[java.util.concurrent.TimeoutException] {
      Concurrent.runAll[Boolean](spark, Seq(
        "waiter" -> (() => gate.await(30, TimeUnit.SECONDS)),
        "starved" -> (() => { gate.countDown(); true })),
        parallelism = 1, timeout = 2.seconds)
    }
    gate.countDown() // release the pool thread
    assert(ex.getMessage.contains("waiter") && ex.getMessage.contains("starved"),
      s"pending jobs not named: ${ex.getMessage}")
  }

  test("concurrent_table_stats equals independently computed values") {
    val got = Concurrent.concurrentTableStats(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expect = Map(
      "customer_rows" -> Tables.customer(spark, sfDir).count().toDouble,
      "events_users" -> Tables.events(spark, sfDir)
        .select(countDistinct("user_id")).head().getLong(0).toDouble,
      "lineitem_total_qty" -> Tables.lineitem(spark, sfDir)
        .select(sum("l_quantity")).head().getDouble(0),
      "orders_rows" -> Tables.orders(spark, sfDir).count().toDouble)
    assert(got == expect)
  }
}
