package graft

import org.apache.spark.sql.functions._
import graft.operators.{LagFeatures, Ranks, Reshape, RollingFeatures, Sampling, Serialize, SftPrep, SnapshotDiff, TokenPack}
import graft.dedup.Decontaminate

/** Round-8 operators: CDC snapshot diff, wide↔long reshape, rolling
  * time-range features, sequence packing, scalable global ranks/ntile,
  * benchmark decontamination, temperature submix. */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot diff classifies insert/delete/update/unchanged, null-safely") {
    val oldS = Seq((1L, Some(10.0), "x"), (2L, Some(20.0), "y"),
      (3L, None: Option[Double], "z")).toDF("k", "v", "tag")
    val newS = Seq((2L, Some(20.0), "y"), (3L, Some(5.0), "z"),
      (4L, Some(1.0), "w")).toDF("k", "v", "tag")
    val got = SnapshotDiff.diff(oldS, newS, Seq("k"), Seq("v", "tag"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 only in old; 4 only in new; 3's v goes NULL→5.0 (must be update,
    // not a null-equality false "unchanged"); 2 identical
    assert(got == Map(1L -> "delete", 2L -> "unchanged",
      3L -> "update", 4L -> "insert"))
    // old/new values ride along
    val r3 = SnapshotDiff.diff(oldS, newS, Seq("k"), Seq("v", "tag"))
      .filter($"k" === 3L).head()
    assert(r3.isNullAt(r3.fieldIndex("old_v")) &&
      r3.getDouble(r3.fieldIndex("new_v")) == 5.0)
  }

  test("unpivot→pivot round-trips a uniquely keyed frame; pivot sums duplicates") {
    val wide = Seq((1L, 2.0, 30.0), (2L, 4.0, 50.0)).toDF("id", "a", "b")
    val long = Reshape.unpivot(wide, Seq("id"), Seq("a", "b"))
    assert(long.count() == 4)
    val back = Reshape.pivot(long, Seq("id"), Seq("a", "b"))
    assert(back.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq ==
      Seq((1L, 2.0, 30.0), (2L, 4.0, 50.0)))
    // duplicate ids fold by sum (well-defined, partitioning-independent)
    val dup = Seq((1L, "a", 2.0), (1L, "a", 3.0)).toDF("id", "measure", "value")
    assert(Reshape.pivot(dup, Seq("id"), Seq("a")).head().getDouble(1) == 5.0)
  }

  test("rolling 24h window counts exactly the trailing day, inclusive") {
    val base = 1700000000000000L // µs epoch
    val h = 3600000000L
    val ev = Seq((1L, 7L, 0L * h, 1.0), (2L, 7L, 1L * h, 2.0),
      (3L, 7L, 25L * h, 4.0), (4L, 8L, 25L * h, 8.0))
      .map { case (id, u, off, v) => (id, u, base + off, v) }
      .toDF("event_id", "user_id", "us", "value")
      .withColumn("ts", timestamp_micros($"us"))
    val got = RollingFeatures.rollingWindow(ev, "user_id", "ts", "value",
      86400000000L, "24h")
      .select("event_id", "cnt_24h", "cents_24h")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // at 25h: the 1h event is exactly 24h back (inclusive), 0h is out
    assert(got == Map(1L -> ((1L, 100L)), 2L -> ((2L, 300L)),
      3L -> ((2L, 600L)), 4L -> ((1L, 800L))))
  }

  test("token packing lays docs end to end and cuts at the budget") {
    val docs = Seq((1L, 300L), (2L, 300L), (3L, 200L))
      .toDF("doc_id", "n_tokens")
    val got = TokenPack.pack(docs, "doc_id", "n_tokens", budget = 512L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset"))).toMap
    // starts 0, 300, 600 → packs 0,0,1 with offsets 0,300,88
    assert(got == Map(1L -> ((0L, 0L)), 2L -> ((0L, 300L)), 3L -> ((1L, 88L))))
  }

  test("global row number is 1..N in order, partitioning-invariant") {
    val df = spark.range(1, 1001).toDF("id")
      .withColumn("key", ($"id" * 7919) % 1000) // shuffled order
    val ranked = Ranks.globalRowNumber(df.repartition(13),
      Seq($"key", $"id"), "rn")
    val rows = ranked.orderBy("rn").collect()
      .map(r => (r.getAs[Long]("rn"), r.getAs[Long]("key"), r.getAs[Long]("id")))
    assert(rows.map(_._1).toSeq == (1L to 1000L))
    // rn order == (key, id) lexicographic order
    assert(rows.map(t => (t._2, t._3)).toSeq == rows.map(t => (t._2, t._3)).sorted.toSeq)
    val again = Ranks.globalRowNumber(df.repartition(3), Seq($"key", $"id"), "rn")
    assert(again.collect().toSet == ranked.collect().toSet)
  }

  test("ntileExact matches SQL ntile semantics: front-loaded remainder buckets") {
    // N=10, k=3 → bucket sizes 4,3,3
    val df = spark.range(1, 11).toDF("id")
    val got = Ranks.ntileExact(df, Seq($"id"), 3, "b")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 1,
      5L -> 2, 6L -> 2, 7L -> 2, 8L -> 3, 9L -> 3, 10L -> 3))
    // N<k: one row per bucket, in order
    val tiny = Ranks.ntileExact(spark.range(1, 4).toDF("id"), Seq($"id"), 10, "b")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tiny == Map(1L -> 1, 2L -> 2, 3L -> 3))
  }

  test("decontamination flags exactly the docs sharing an n-gram with the bench") {
    val eight = "alpha beta gamma delta epsilon zeta eta theta"
    val bench = Seq((100L, s"prefix words $eight suffix")).toDF("id", "text")
    val corpus = Seq(
      (1L, s"totally different lead $eight and a tail"), // shares the 8-gram
      (2L, "alpha beta gamma delta epsilon zeta eta NOTtheta x"), // 7-gram only
      (3L, "short doc under eight words here now"), // <8 words: can't flag
      (4L, "completely unrelated content with plenty of words to spare"))
      .toDF("id", "text")
    val bad = Decontaminate.contaminatedIds(corpus, bench, "id", "text", 8)
      .collect().map(_.getLong(0)).toSet
    assert(bad == Set(1L))
    val clean = Decontaminate.decontaminate(corpus, bench, "id", "text", 8)
      .collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L, 3L, 4L))
  }

  test("sparse BoW matches an independent per-token computation; invariant to partitioning") {
    import graft.functions.{BowVectors, PolyFingerprint}
    val docs = Seq((1L, "red fox jumps"), (2L, "red red blue"))
      .toDF("id", "text")
    val got = BowVectors.bowSparse(docs, "id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // independent formulation: fingerprint of a one-word doc IS the token hash
    val expect = Seq((1L, "red fox jumps"), (2L, "red red blue"))
      .flatMap { case (id, t) => t.split("\\s+").map(w => (id, PolyFingerprint.compute(w))) }
      .groupBy { case (id, h) => (id, (h / 2) % 8) }
      .view.mapValues(_.map { case (_, h) => 1L - 2L * (h % 2) }.sum).toMap
    assert(got == expect)
    val reparted = BowVectors.bowSparse(docs.repartition(5), "id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(reparted == got)
  }

  test("sparse cosine top-k: planted duplicate ranks first with cos 1.0") {
    import graft.functions.BowVectors
    val docs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of query
      (2L, "the quick brown fox naps under the busy dog"),
      (3L, "entirely unrelated legal boilerplate paragraph text"))
      .toDF("id", "text")
    val v = BowVectors.bowSparse(docs, "id", "text", 64)
    val top = BowVectors.sparseTopK(
      v.filter($"id" === 100L), v.filter($"id" =!= 100L), k = 3)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cos_sim")))
    assert(top.head == ((1, 1L, 1.0)), s"duplicate not top-1: ${top.toSeq}")
    assert(top.map(_._2).toSet.subsetOf(Set(1L, 2L, 3L)))
    // similarity must order the near-dup above the unrelated doc
    val byId = top.map(t => t._2 -> t._3).toMap
    assert(byId(2L) > byId(3L))
  }

  test("sft prepare: scrub collapses serial-only duplicates; prompt is templated") {
    val docs = Seq(
      (1L, "the cat sat SN12X on the mat", "en"),
      (9L, "the cat sat SN99Y on the mat", "en"), // dup after scrub
      (3L, "le chat noir A7B dort", "fr"))
      .toDF("doc_id", "dirty", "lang")
    val out = SftPrep.prepare(docs, "doc_id", "dirty", "lang", 0.8)
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // serial tokens differ, scrubbed content identical → one row, min id kept
    assert(rows.length == 2 && rows.map(_._1).toSet == Set(1L, 3L))
    val p1 = rows.find(_._1 == 1L).get._3
    assert(p1.startsWith("<s>[INST] <<SYS>>\n" + SftPrep.SystemMessage))
    assert(p1.contains("the cat sat  on the mat [/INST] en </s>"),
      s"scrub/template wrong: $p1")
    assert(!p1.contains("SN12X"))
  }

  test("sft length stats: exact indexed order statistics from the histogram") {
    // 10 prompts of known token lengths 1..10 in one split
    val prompts = (1 to 10)
      .map(n => ("train", Seq.fill(n)("w").mkString(" ")))
      .toDF("split", "prompt")
    val s = SftPrep.lengthStats(prompts, "split", "prompt").head()
    assert(s.getAs[Long]("n_docs") == 10)
    assert(s.getAs[Long]("min_len") == 1 && s.getAs[Long]("max_len") == 10)
    // median = element at index n DIV 2 = lengths(5) = 6 (0-based)
    assert(s.getAs[Long]("median_len") == 6)
    // p99 = element at floor(9.9) = index 9 → 10
    assert(s.getAs[Long]("p99_len") == 10)
  }

  test("lag features: daily totals, shifted lags, trailing-7 mean") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 06:00:00")
    def day(d: Int) = new java.sql.Timestamp(base.getTime + d * 86400000L)
    // user 1: 10 days of value d+1 dollars; two events on day 0
    val ev = ((0 until 10).map(d => (1L, day(d), (d + 1).toDouble)) :+
      ((1L, day(0), 0.5))).toDF("user_id", "ts", "value")
    val got = LagFeatures.dailyLagFrame(ev, "user_id", "ts", "value")
      .orderBy("day").collect()
    val cents = got.map(_.getAs[Long]("day_cents")).toSeq
    assert(cents == Seq(150L, 200L, 300L, 400L, 500L, 600L, 700L, 800L, 900L, 1000L))
    assert(got(0).isNullAt(got(0).fieldIndex("lag1_cents")))
    assert(got(1).getAs[Long]("lag1_cents") == 150L)
    assert(got(7).getAs[Long]("lag7_cents") == 150L)
    // trailing-7 mean on day 7: (200+...+800)/7
    assert(got(7).getAs[Double]("ma7_cents") ==
      math.rint((200 to 800 by 100).sum / 7.0 * 10000) / 10000)
  }

  test("row serialization pins formats and renders nulls explicitly") {
    val df = Seq((1L, Some(12.5), Some("x")), (2L, None: Option[Double], None: Option[String]))
      .toDF("id", "amt", "tag")
    val got = Serialize.rowToText(df, Seq("id", "amt", "tag"))
      .orderBy("id").collect().map(_.getAs[String]("row_text"))
    assert(got(0) == "id: 1 | amt: 12.50 | tag: x")
    assert(got(1) == "id: 2 | amt: null | tag: null")
  }

  test("multi-dim star split: dims independent of peel order, fact reconstructs") {
    import graft.operators.StarSplit
    val df = Seq(
      (1L, "red", "S", 10.0), (2L, "red", "M", 20.0),
      (3L, "blue", "S", 30.0), (4L, "blue", "M", 40.0))
      .toDF("id", "color", "size", "amt")
    val dims = Seq(Seq("color") -> "color_sk", Seq("size") -> "size_sk")
    val (ds, fact) = StarSplit.splitAll(df, dims)
    assert(ds.map(_.count()).toSeq == Seq(2L, 2L))
    assert(fact.columns.toSet == Set("id", "amt", "color_sk", "size_sk"))
    // rejoining both dims reconstructs the input
    val back = fact.join(ds(0), "color_sk").join(ds(1), "size_sk")
      .select("id", "color", "size", "amt")
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // dim content doesn't depend on peel order
    val (dsRev, _) = StarSplit.splitAll(df, dims.reverse)
    assert(ds(0).collect().toSet == dsRev(1).collect().toSet)
    assert(ds(1).collect().toSet == dsRev(0).collect().toSet)
  }

  test("incremental agg maintenance: batch order and batching don't matter") {
    import graft.operators.IncrementalAgg
    val rows = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("b", 20L), ("c", 5L))
      .toDF("k", "v")
    val direct = rows.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    def fold(batches: Seq[org.apache.spark.sql.DataFrame]) =
      batches.foldLeft(IncrementalAgg.emptyState(spark, rows, Seq("k"), Seq("v")))(
        (s, b) => IncrementalAgg.maintain(s, b, Seq("k"), Seq("v")))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val twoBatches = fold(Seq(rows.filter($"v" < 10), rows.filter($"v" >= 10)))
    val fiveBatches = fold((0 to 4).map(i =>
      rows.filter(($"v" % 5) === i).toDF()))
    assert(twoBatches == direct && fiveBatches == direct)
  }

  test("token packing invariants hold on random corpora (seeded)") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 200L).map(id => (id, 1L + rnd.nextInt(700).toLong))
      .toDF("doc_id", "n_tokens")
    val budget = 512L
    val got = TokenPack.pack(docs, "doc_id", "n_tokens", budget)
      .orderBy("doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("pack_id"), r.getAs[Long]("pack_offset")))
    // offsets in range, pack ids non-decreasing, stream positions contiguous
    assert(got.forall { case (_, _, _, off) => off >= 0 && off < budget })
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
    var start = 0L
    got.foreach { case (id, n, pid, off) =>
      assert(pid == start / budget && off == start % budget,
        s"doc $id misplaced: start=$start pid=$pid off=$off")
      start += n
    }
  }

  test("ntile bucket sizes differ by at most one, larger buckets first (seeded)") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 3) {
      val n = 50 + rnd.nextInt(400)
      val k = 1 + rnd.nextInt(12)
      val sizes = Ranks.ntileExact(spark.range(1, n + 1).toDF("id"),
        Seq($"id"), k, "b")
        .groupBy("b").count().orderBy("b")
        .collect().map(r => r.getInt(0) -> r.getLong(1))
      assert(sizes.map(_._2).sum == n)
      assert(sizes.map(_._2).distinct.length <= 2)
      assert(sizes.map(_._2).toSeq == sizes.map(_._2).sortBy(-_).toSeq,
        s"remainder buckets must come first: ${sizes.toSeq} (n=$n k=$k)")
    }
  }

  test("snapshot diff degenerate cases: self-diff, empty sides") {
    val x = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val empty = x.limit(0)
    def types(d: org.apache.spark.sql.DataFrame) =
      d.select("change_type").collect().map(_.getString(0)).toSeq
    assert(types(SnapshotDiff.diff(x, x, Seq("k"), Seq("v"))).forall(_ == "unchanged"))
    assert(types(SnapshotDiff.diff(empty, x, Seq("k"), Seq("v"))).forall(_ == "insert"))
    assert(types(SnapshotDiff.diff(x, empty, Seq("k"), Seq("v"))).forall(_ == "delete"))
  }

  test("format roundtrips survive hostile text: quotes, commas, unicode, empties") {
    import graft.sources.Formats
    val nasty = Seq(
      (1L, """he said "hi, there" | and left""", Some(3L)),
      (2L, "commas,,,and\ttabs", None: Option[Long]),
      (3L, "ünïcødé 汉字 😀", Some(-7L)),
      (4L, "", Some(0L)))
      .toDF("id", "text", "n")
    val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString
    for (fmt <- Seq("json", "orc")) {
      val back = Formats.roundtrip(nasty, fmt, s"$base/$fmt")
      assert(back.exceptAll(nasty).isEmpty && nasty.exceptAll(back).isEmpty,
        s"$fmt roundtrip mangled rows")
    }
    val csv = Formats.roundtrip(nasty, "csv", s"$base/csv",
      Map("header" -> "true", "quote" -> "\"", "escape" -> "\""))
    // CSV cannot distinguish empty string from null: normalize both sides
    val norm = (d: org.apache.spark.sql.DataFrame) =>
      d.withColumn("text", coalesce($"text", lit("")))
    assert(norm(csv).exceptAll(norm(nasty)).isEmpty &&
      norm(nasty).exceptAll(norm(csv)).isEmpty, "csv roundtrip mangled rows")
  }

  test("rollup/cube: subtotal levels reconcile and plan as ONE pass") {
    import graft.operators.GroupingSets
    val df = Seq(("a", "x", 10L), ("a", "y", 20L), ("b", "x", 30L))
      .toDF("k1", "k2", "cents")
    val r = GroupingSets.rollupAgg(df, Seq("k1", "k2"), "cents")
    val byGid = r.collect().groupBy(_.getAs[Long]("gid"))
    // every rollup level must re-total to the same grand sum
    assert(byGid.keySet == Set(0L, 1L, 3L))
    byGid.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("sum_cents")).sum == 60L)
      assert(rows.map(_.getAs[Long]("cnt")).sum == 3L)
    }
    val c = GroupingSets.cubeAgg(df, Seq("k1", "k2"), "cents")
    val cGids = c.collect().groupBy(_.getAs[Long]("gid"))
    assert(cGids.keySet == Set(0L, 1L, 2L, 3L)) // all 2^2 subsets
    cGids.values.foreach(rows =>
      assert(rows.map(_.getAs[Long]("sum_cents")).sum == 60L))
    // one Expand + aggregate — not one scan per grouping set
    val plan = c.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"cube should plan via Expand:\n$plan")
    assert(c.queryExecution.optimizedPlan.collectLeaves().size == 1,
      "cube must be a single pass over the input")
  }

  test("temperature thresholds: T=1 proportional, larger T flattens, capped at M") {
    val counts = Seq("a" -> 100L, "b" -> 400L)
    // T=1: rate targetRows/total for every stratum (proportional draw)
    val t1 = Sampling.temperatureThresholds(counts, 1.0, 250.0)
    assert(t1("a") == t1("b") && t1("a") == 500000L) // 250/500 of each
    // T=2: sqrt weights 10:20 → frac_a=250·(10/30)/100, frac_b=250·(20/30)/400
    val t2 = Sampling.temperatureThresholds(counts, 2.0, 250.0)
    assert(t2("a") == Math.round(250.0 * 10 / 30 / 100 * 1000000))
    assert(t2("b") == Math.round(250.0 * 20 / 30 / 400 * 1000000))
    assert(t2("a") > t2("b"), "temperature must upweight the small stratum")
    // oversampling demand caps at keep-everything
    assert(Sampling.temperatureThresholds(Seq("a" -> 10L), 2.0, 1e9)("a") == 1000000L)
  }
}
