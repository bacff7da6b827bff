package graft.operators

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Concurrent execution of independent queries in ONE SparkSession — the
  * counterpart of the reference's notebook parallelizer
  * (/root/reference/DataEngineering/DataBricks/parallelize_db_notebooks.py:1-39:
  * a ThreadPoolExecutor firing independent notebook runs). A Spark
  * session schedules actions from different threads concurrently; with
  * `spark.scheduler.mode=FAIR` each job lands in its own scheduler pool
  * so a long job cannot starve short ones (under the default FIFO the
  * pool property is inert and jobs still interleave at stage
  * granularity).
  *
  * Scale stance: this is DRIVER-side orchestration only — each job is
  * still a fully distributed Spark query; the executor fleet is shared
  * and FAIR-scheduled. The win is wall-clock utilization when individual
  * queries can't saturate the cluster (small dims, skewed tails, scan
  * stalls) — exactly why the reference parallelizes its notebooks.
  */
object Concurrent {

  /** Run `jobs` concurrently on `parallelism` driver threads, each action
    * tagged into its own FAIR pool. Results return in INPUT ORDER (not
    * completion order). A job failure fails the whole call — matching
    * the all-or-nothing contract of the reference's notebook runner.
    *
    * `timeout` bounds the whole batch: jobs that inter-depend (or hang on
    * an external system) with fewer threads than waiters would otherwise
    * deadlock the caller forever; on expiry the call fails NAMING the
    * still-pending jobs so the stuck dependency is diagnosable. */
  def runAll[T](spark: SparkSession, jobs: Seq[(String, () => T)],
                parallelism: Int = 4, poolPrefix: String = "graft",
                timeout: Duration = Duration.Inf): Seq[(String, T)] = {
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = jobs.zipWithIndex.map { case ((name, job), i) =>
        Future {
          // local properties are thread-confined: set, run, clear
          spark.sparkContext.setLocalProperty("spark.scheduler.pool", s"$poolPrefix-$i")
          try name -> job()
          finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
        }
      }
      try Await.result(Future.sequence(fs), timeout)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          val pending = jobs.map(_._1).zip(fs)
            .collect { case (n, f) if !f.isCompleted => n }
          throw new java.util.concurrent.TimeoutException(
            s"runAll timed out after $timeout with ${pending.size} job(s) " +
              s"still pending: ${pending.mkString(", ")}")
      }
    } finally pool.shutdown()
  }

  // ---- query-map entry (hash-gated) ----

  /** Four independent table statistics computed CONCURRENTLY (count,
    * exact sum, count, exact distinct) and returned as one tidy
    * (stat, value) frame. Each stat is deterministic (counts and an
    * integral-valued double sum — exact in IEEE doubles regardless of
    * reduction order), so the concurrent result hash-matches the serial
    * DuckDB oracle. */
  def concurrentTableStats(spark: SparkSession, dir: String): DataFrame = {
    val jobs: Seq[(String, () => Double)] = Seq(
      "customer_rows" -> (() =>
        Tables.customer(spark, dir).count().toDouble),
      "events_users" -> (() =>
        Tables.events(spark, dir).select(countDistinct("user_id"))
          .head().getLong(0).toDouble),
      "lineitem_total_qty" -> (() =>
        // sum() is NULL on an empty input — coalesce so the stat is 0.0,
        // not an NPE out of getDouble
        Tables.lineitem(spark, dir).select(coalesce(sum("l_quantity"), lit(0.0)))
          .head().getDouble(0)),
      "orders_rows" -> (() =>
        Tables.orders(spark, dir).count().toDouble))
    val rows = runAll(spark, jobs).map { case (k, v) => Row(k, v) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("stat", StringType, nullable = false),
        StructField("value", DoubleType, nullable = false))))
  }

  def oracleSql: String =
    """SELECT 'customer_rows' AS stat, CAST(count(*) AS DOUBLE) AS value FROM customer
      |UNION ALL
      |SELECT 'events_users', CAST(count(DISTINCT user_id) AS DOUBLE) FROM events
      |UNION ALL
      |SELECT 'lineitem_total_qty', CAST(sum(l_quantity) AS DOUBLE) FROM lineitem
      |UNION ALL
      |SELECT 'orders_rows', CAST(count(*) AS DOUBLE) FROM orders""".stripMargin
}
