package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import scala.collection.mutable.ArrayBuffer

/** Empirical profiling for the optimization rounds (guide §1.1/§7.1
  * without a UI): runs a query key through the noop sink (after one
  * untimed warmup of q1 for session spin-up) and prints every stage's
  * wall time, task count, shuffle read/write bytes and records, sorted
  * by duration — the "which stage is slow" answer the Stages tab would
  * give. Session config matches [[Bench]].
  *
  * Usage: ProfileRun key [reps]
  */
object ProfileRun {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => }
    case class St(id: Int, name: String, ms: Long, tasks: Int,
      srBytes: Long, srRecs: Long, swBytes: Long, swRecs: Long,
      inBytes: Long, spill: Long)
    val stages = ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val ms = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(90),
            ms, si.numTasks,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleReadMetrics.recordsRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.shuffleWriteMetrics.recordsWritten,
            m.inputMetrics.bytesRead, m.memoryBytesSpilled)
        }
      }
    })
    for (rep <- 1 to reps) {
      stages.synchronized(stages.clear())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.sparkContext.setJobDescription(s"profile: $key")
      val t0 = System.nanoTime()
      SparkEntry.queries(key)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      Thread.sleep(600)
      val snap = stages.synchronized(stages.toVector)
      println(f"%n=== $key rep $rep: total $dt%.2f s, ${snap.size} stages, " +
        f"${snap.map(_.ms).sum} stage-ms (sum), " +
        f"${snap.map(_.srBytes).sum / 1e6}%.1f MB shuffle read ===")
      println(f"${"ms"}%7s ${"tasks"}%5s ${"shRdMB"}%8s ${"shRdRec"}%9s " +
        f"${"shWrMB"}%8s ${"shWrRec"}%9s ${"inMB"}%7s ${"spillMB"}%7s  stage")
      snap.sortBy(-_.ms).take(28).foreach { s =>
        println(f"${s.ms}%7d ${s.tasks}%5d ${s.srBytes / 1e6}%8.1f " +
          f"${s.srRecs}%9d ${s.swBytes / 1e6}%8.1f ${s.swRecs}%9d " +
          f"${s.inBytes / 1e6}%7.1f ${s.spill / 1e6}%7.1f  [${s.id}] ${s.name}")
      }
    }
    spark.stop()
  }
}
