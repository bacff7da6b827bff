package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

/** Tolerance-vs-exact gates for the sketch operators (driver checks rows
  * only — these assertions are the accuracy contract the scaladoc
  * promises: HLL++ estimates within a few rsd of exact distinct counts,
  * GK quantiles within the guaranteed rank error). */
class SketchSpec extends SparkSpec {

  test("distinct-under-cap: exact below cap, sentinel above, any partitioning") {
    import spark.implicits._
    import graft.functions.DistinctSketch.distinctUnderCap
    // 3 groups: small (7 distinct), duplicated-heavy (5 distinct from
    // 500 rows), overflowing (40 distinct vs cap 32)
    val rows = (1 to 7).map(i => ("small", i.toLong)) ++
      (1 to 500).map(i => ("dups", (i % 5).toLong)) ++
      (1 to 200).map(i => ("big", (i % 40).toLong))
    for (parts <- Seq(1, 4, 13)) { // merge order must not matter
      val got = rows.toDF("g", "v").repartition(parts)
        .groupBy("g").agg(distinctUnderCap(32)(col("v")).as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("small" -> 7L, "dups" -> 5L, "big" -> -1L),
        s"at $parts partitions: $got")
    }
  }

  test("audience overlap: hand-computed sets, exact under cap") {
    import spark.implicits._
    import graft.functions.DistinctSketch.audienceOverlap
    // A = {1..10}, B = {6..20}: |A∩B| = 5, |A∪B| = 20
    val rows = (1 to 10).map(i => ("A", i.toLong)) ++
      (6 to 20).map(i => ("B", i.toLong)) ++
      (1 to 10).map(i => ("A", i.toLong)) // duplicates must not count
    val got = audienceOverlap(rows.toDF("seg", "uid"), "seg", "uid", cap = 100)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(got.toSeq == Seq(("A", "B", 10L, 15L, 5L, 20L, 0.25)),
      s"overlap wrong: ${got.toSeq}")
  }

  test("audience overlap plans the sketch aggregate once, not per join side") {
    import graft.functions.DistinctSketch.audienceOverlapEvents
    // The eager localCheckpoint inside audienceOverlap materializes the
    // per-segment sketch sets BEFORE the self-join, so the pair join's
    // physical plan must read the checkpointed RDD on both sides and
    // contain neither the sketch aggregate nor an events scan.
    val plan = audienceOverlapEvents(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaAggregator"),
      "sketch aggregate re-planned after checkpoint")
    assert(!plan.contains("events.parquet"),
      "events scan re-planned after checkpoint")
    val rddScans = "ExistingRDD".r.findAllIn(plan).length
    assert(rddScans >= 2,
      s"expected both join sides on the checkpointed RDD, plan:\n$plan")
  }

  test("approx_count_distinct within tolerance of exact per group") {
    val events = Tables.events(spark, sfDir)
    val approx = Sketches.approxDistinct(events, "event_type", "user_id", rsd = 0.02)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("d"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (d, n)) =>
      val (est, nRows) = approx(k)
      assert(nRows == n, s"exact row count disagrees for $k")
      // rsd is one sigma; 5 sigma (and never tighter than ±2 absolute for
      // tiny groups) is a deterministic bound HLL++ meets comfortably —
      // at small cardinalities its sparse mode is exact anyway
      val tol = math.max(2.0, 5 * 0.02 * d)
      assert(math.abs(est - d) <= tol,
        s"HLL estimate $est vs exact $d for $k exceeds tolerance $tol")
    }
  }

  test("portable grouped HLL estimate within m=64 error envelope of exact") {
    val events = Tables.events(spark, sfDir)
    val est = graft.functions.Hll
      .sketchBy(events.select("event_type", "user_id"), "event_type", "user_id")
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_rows"),
        r.getAs[Long]("est_micro")))).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("d"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, (d, n)) =>
      val (nRows, em) = est(k)
      assert(nRows === n)
      val e = em / 1e6
      // m = 64 registers: rse = 1.04/sqrt(64) = 13%; 4 sigma + small-n
      // slack is a deterministic envelope the validated constants meet
      val tol = math.max(3.0, 4 * (1.04 / 8.0) * d)
      assert(math.abs(e - d) <= tol,
        s"portable HLL estimate $e vs exact $d for $k exceeds $tol")
    }
  }

  test("portable HLL is mergeable: disjoint-half estimates equal the whole") {
    // the sketch state is per-bucket MAX rank, so sketching any
    // partition split and max-merging must reproduce the full sketch;
    // splitting by event parity and re-grouping under one key is
    // exactly that merge (the groupBy max IS the merge operator)
    val events = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id"), col("event_id"))
    val whole = graft.functions.Hll
      .sketchBy(events.select("event_type", "user_id"), "event_type", "user_id")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est_micro")).toMap
    // shuffle the rows arbitrarily (repartition) — estimates must not move
    val shuffled = graft.functions.Hll
      .sketchBy(events.repartition(7, col("event_id"))
        .select("event_type", "user_id"), "event_type", "user_id")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est_micro")).toMap
    assert(whole === shuffled)
  }

  test("percentile_approx within GK rank-error bound of exact per group") {
    val li = Tables.lineitem(spark, sfDir)
    val qs = Seq(0.5, 0.9, 0.99)
    val accuracy = 10000
    val approx = Sketches
      .approxQuantilesLong(li, "l_returnflag", "l_extendedprice", qs, accuracy)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap

    val byGroup = li.select("l_returnflag", "l_extendedprice")
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap

    assert(approx.keys.map(_._1).toSet == byGroup.keySet)
    for ((flag, vals) <- byGroup; q <- qs) {
      val est = approx((flag, q))
      val n = vals.length
      // GK guarantee: the returned value's rank is within n/accuracy of
      // the target rank (+1 slack for discrete-rank rounding)
      val rank = vals.count(_ <= est)
      val target = q * n
      val tol = n.toDouble / accuracy + 1
      assert(math.abs(rank - target) <= tol,
        s"quantile $q for $flag: est $est has rank $rank, target $target ± $tol (n=$n)")
      // and the value itself is one the data contains (GK returns a sample)
      assert(vals.contains(est), s"quantile $q for $flag returned non-sample value $est")
    }
  }

  test("sketchQuantilesNative: API-parity wrapper honors the GK bound") {
    // The Spark-native percentile_approx variant kept alongside the
    // hash-gated portable summary (Sketches.scala `sketchQuantilesNative`
    // scaladoc) — this is its spec gate: default qs/accuracy, same
    // rank-error contract as the kernel test above.
    val rows = Sketches.sketchQuantilesNative(spark, sfDir).collect()
    val byGroup = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_extendedprice")
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(rows.map(_.getString(0)).toSet == byGroup.keySet)
    assert(rows.length == byGroup.size * 3) // default qs = (0.5, 0.9, 0.99)
    for (r <- rows) {
      val (flag, q, est) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      val vals = byGroup(flag)
      val n = vals.length
      val rank = vals.count(_ <= est)
      val tol = n.toDouble / 10000 + 1
      assert(math.abs(rank - q * n) <= tol,
        s"native wrapper: q=$q flag=$flag est=$est rank=$rank target=${q * n} ± $tol")
      assert(vals.contains(est))
    }
  }

  test("portable quantile summary: rank within n/EpsDen, value a real cell") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val qs = Seq(250L, 500L, 750L, 990L)
    val got = Sketches.gkQuantiles(li, "l_returnflag", "cents", qs)
      .collect().map(r => (r.getString(0), r.getAs[Long]("q_permille")) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("quantile_dollars")))).toMap
    val byGroup = li.collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view
      .mapValues(_.map(t => t._2 / Sketches.GkValueScale).sorted).toMap
    for ((flag, cells) <- byGroup; q <- qs) {
      val (n, est) = got((flag, q))
      assert(n === cells.length.toLong)
      // rank guarantee: est's cell rank within n/EpsDen (+1 discrete
      // slack) ABOVE the target (the summary answers the smallest grid
      // rank at/past the target, never below it)
      val target = math.ceil(q.toDouble * n / 1000.0)
      val rankLo = cells.count(_ < est) + 1 // first position of est's cell
      val rankHi = cells.count(_ <= est)
      val tol = n.toDouble / Sketches.GkEpsDen + 1
      assert(rankHi >= target - tol && rankLo <= target + tol,
        s"$flag q=$q: est cell $est spans ranks [$rankLo,$rankHi], " +
          s"target $target ± $tol (n=$n)")
      assert(cells.contains(est), s"$flag q=$q: $est is not a data cell")
    }
  }

  test("portable quantile summary: seeded random frames honor the guarantee") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 5) {
      val n = 200 + rnd.nextInt(2000)
      val dist = rnd.nextInt(3)
      val vals = Seq.fill(n)(dist match {
        case 0 => rnd.nextInt(1000000).toLong                // uniform
        case 1 => math.abs(rnd.nextGaussian() * 50000).toLong // half-normal
        case 2 => (math.pow(10, rnd.nextDouble() * 5)).toLong // log-uniform
      })
      val df = vals.map(("g", _)).toDF("key", "cents")
      val qs = Seq(100L, 500L, 900L)
      val got = Sketches.gkQuantiles(df, "key", "cents", qs)
        .collect().map(r => r.getAs[Long]("q_permille") ->
          r.getAs[Long]("quantile_dollars")).toMap
      val cells = vals.map(_ / Sketches.GkValueScale).sorted
      for (q <- qs) {
        val est = got(q)
        val target = math.ceil(q.toDouble * n / 1000.0)
        val rankLo = cells.count(_ < est) + 1
        val rankHi = cells.count(_ <= est)
        val tol = n.toDouble / Sketches.GkEpsDen + 1
        assert(rankHi >= target - tol && rankLo <= target + tol,
          s"trial $trial dist $dist n=$n q=$q: est $est spans " +
            s"[$rankLo,$rankHi], target $target ± $tol")
        assert(cells.contains(est))
      }
    }
  }

  test("portable quantile summary is mergeable: split halves ≡ whole") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val whole = Sketches.gkQuantiles(li, "l_returnflag", "cents", Seq(500L, 990L))
    // the mergeable state is the (group, cell) count table: feeding the
    // same rows as two unioned halves at a different partitioning must
    // reproduce the summary bit-for-bit (map-side partials merge)
    val a = li.filter(col("cents") % 2 === 0).repartition(3)
    val b = li.filter(col("cents") % 2 =!= 0).repartition(5)
    val merged = Sketches.gkQuantiles(a.unionByName(b), "l_returnflag",
      "cents", Seq(500L, 990L))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("approximate Misra-Gries honors the N/k error guarantee under eviction") {
    import graft.operators.FreqSketch
    // zipf-ish planted corpus: 3 heavy items over 60 light singletons,
    // capacity 8 << 63 distinct values forces real evictions
    val rows = Seq.fill(300)("hot1") ++ Seq.fill(200)("hot2") ++
      Seq.fill(100)("hot3") ++ (1 to 60).map(i => s"light$i")
    val n = rows.length.toLong
    val k = 8
    val df = spark.createDataFrame(rows.map(Tuple1(_))).toDF("v")
      .repartition(4) // evictions must merge across partitions too
    val got = FreqSketch.heavyHitters(df, "v", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Map("hot1" -> 300L, "hot2" -> 200L, "hot3" -> 100L)
    for ((item, t) <- truth) {
      // every item with true count > N/k MUST survive, estimate within
      // [true − N/k, true]
      assert(got.contains(item), s"heavy item $item evicted: $got")
      assert(got(item) <= t && got(item) >= t - n / k,
        s"$item estimate ${got(item)} outside [${t - n / k}, $t]")
    }
    assert(got.size <= 2 * (k - 1), s"sketch kept too many counters: ${got.size}")
  }

  test("exact-mode GK (accuracy >= n) returns the discrete-quantile element") {
    val li = Tables.lineitem(spark, sfDir)
    val qs = Seq(0.25, 0.5, 0.75, 0.99)
    val exact = Sketches
      .approxQuantilesLong(li, "l_returnflag", "l_quantity", qs,
        accuracy = 10000000)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byGroup = li.select("l_returnflag", "l_quantity")
      .collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // quantile_disc convention: the element at rank ceil(q·n), 1-based
    for ((flag, vals) <- byGroup; q <- qs) {
      val want = vals(math.max(0, math.ceil(q * vals.length).toInt - 1))
      assert(exact((flag, q)) == want,
        s"exact-mode quantile $q for $flag: got ${exact((flag, q))}, want $want")
    }
  }
}
