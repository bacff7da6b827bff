package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC") // date ops match Verify
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts NANOS
      .config("spark.scheduler.mode", "FAIR") // concurrent runner pools
      .config("spark.ui.enabled", "false")
      // ContextCleaner only reaps dropped broadcasts/RDD refs after a
      // driver GC; its OWN periodic GC defaults to 30min, so a ~30min
      // full sweep gets exactly one. At 1min the cleaner keeps pace with
      // the per-query churn (the r14 in-suite-vs-isolated gap suspect).
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: session/codegen/scan spin-up otherwise lands on
    // whichever query happens to run first
    try SparkEntry.queries("q1_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    // median of 3 runs per query: a loaded sandbox inflated the round-4
    // bench ~3x uniformly with no code change, so a single sample can't
    // be trusted as a ratio against earlier rounds
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // optional comma-separated key filter for local iteration; the driver
    // sets neither env var and benches everything at 3 reps
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(keys) => SparkEntry.queries.filter { case (n, _) => keys(n) }
      case None => SparkEntry.queries
    }
    // reps are interleaved ROUND-ROBIN across queries, not run
    // back-to-back: a sustained sandbox load spike then lands on one rep
    // of many queries instead of all reps of a few, so the per-query
    // median stays comparable across rounds. Per-rep times are emitted in
    // the JSON so any residual noise is diagnosable post hoc.
    val timesByQ = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      selected.keys.toSeq.map(_ -> Vector.empty[Double]): _*)
    // host-load marker (r15 judge ask): 1-min loadavg before/after each
    // rep, so a sweep outlier is mechanically separable from a plan
    // regression — a rep that ran at load 30 on a 32-core host is noise
    def loadavg(): Double =
      try scala.io.Source.fromFile("/proc/loadavg").getLines().next()
        .split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val loadsByQ = scala.collection.mutable.LinkedHashMap[String, Vector[(Double, Double)]](
      selected.keys.toSeq.map(_ -> Vector.empty[(Double, Double)]): _*)
    var qCount = 0
    var leftoverMax = 0
    var leftoverAt = ""
    for (_ <- 1 to reps; (name, fn) <- selected if !errors.contains(name)) {
      val loadBefore = loadavg()
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune computed
      // projection columns, so map-heavy queries would bench a near-noop
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
          System.err.println(s"[bench] $name FAILED: ${errors(name)}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators persist intermediates (LSH signatures, shingle sets)
      // for the duration of their action; drop them between runs.
      // clearCache() misses localCheckpoint RDDs (they are persisted
      // RDDs, not catalog-cached tables) — ~10 operators eagerly
      // checkpoint per call, and across 179 queries × 3 reps those
      // blocks pile up in the block manager until driver GC lets
      // ContextCleaner reap them. That accumulation was the round-10
      // suite-wide drift (+18% on unchanged keys); free them explicitly.
      spark.catalog.clearCache()
      // BLOCKING unpersist: a fire-and-forget drop can still be
      // releasing blocks while the next query's timed region runs
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      // audit the sweep: anything still persisted here survives between
      // keys and inflates every later measurement — make it visible
      val leftover = spark.sparkContext.getPersistentRDDs.size
      if (leftover > leftoverMax) { leftoverMax = leftover; leftoverAt = name }
      qCount += 1
      // broadcasts are only freed via ContextCleaner after driver GC;
      // nudge it periodically OUTSIDE the timed region
      if (qCount % 25 == 0) System.gc()
      if (!errors.contains(name)) {
        timesByQ(name) = timesByQ(name) :+ dt
        loadsByQ(name) = loadsByQ(name) :+ ((loadBefore, loadavg()))
      }
    }
    def r2(v: Double): String = (math.rint(v * 100) / 100).toString
    val results = timesByQ.map { case (name, times) =>
      name -> (if (times.isEmpty) -1.0 else times.sorted.apply(times.length / 2))
    }
    // a failed query reports -1, never a fast success
    val qs = results.map { case (k, v) =>
      s"\"" + k + "\":" + (if (errors.contains(k)) "-1" else r2(v))
    }.mkString("{", ",", "}")
    val repJson = timesByQ.map { case (k, ts) =>
      s"\"" + k + "\":" + ts.map(t => (math.rint(t * 1000) / 1000).toString)
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // full escaping (Json.str): an exception message with an exotic
    // control char must not make the one metrics line unparseable
    val es = errors.map { case (k, v) => Json.str(k) + ":" + Json.str(v) }.mkString("{", ",", "}")
    val total = results.collect { case (k, v) if !errors.contains(k) => v }.sum
    val slow = results.toSeq.filterNot { case (k, _) => errors.contains(k) }
      .sortBy(-_._2).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + r2(v) }.mkString("{", ",", "}")
    // Full detail (per-rep times included) goes to a FILE: the harness
    // that snapshots this run keeps only the last ~2000 chars of stdout,
    // and a 100-query JSON line does not fit. The one printed line is
    // ordered so its TAIL carries what matters if the front is cut:
    // per-query medians first, then slowest-10, errors, and the total
    // LAST — a truncated capture still ends in the headline number.
    val loadJson = loadsByQ.map { case (k, ls) =>
      s"\"" + k + "\":" + ls.map { case (b, a) =>
        s"[${math.rint(b * 100) / 100},${math.rint(a * 100) / 100}]"
      }.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"reps":$repJson,"loadavg":$loadJson,"errors":$es,"persisted_leftover_max":$leftoverMax,"persisted_leftover_at":${Json.str(leftoverAt)},"sf":"$sfDir"}"""
    try {
      val out = java.nio.file.Paths.get("bench_full.json")
      java.nio.file.Files.write(out, fullLine.getBytes("UTF-8"))
    } catch { case _: Throwable => () } // a read-only CWD must not fail the bench
    println(s"""{"queries":$qs,"detail":"bench_full.json","errors":$es,"slowest":$slow,"metric":"total","unit":"sec","sf":"$sfDir","n":${results.size},"value":${r2(total)}}""")
    spark.stop()
  }
}
