package graft

import org.apache.spark.sql.functions._
import graft.operators.{Contingency, Intervals, Resample, Throttle}
import graft.dedup.EntityResolution

/** Round-10 wired operators: sweep-line interval concurrency,
  * keep-first throttling, daily spine resampling, chi-square
  * contingency, and entity resolution (fuzzy match + transitive
  * closure). Planted-data semantics; cross-engine equality is the
  * DuckDB hash gate. */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("peak concurrency: sweep-line counts overlaps, half-open back-to-back never overlaps") {
    // k1: [0,10) [5,15) [5,8) peak 3; [15,20) touches [5,15) only at 15 -> not 4
    // k2: [0,1) [1,2) back-to-back chain -> peak 1
    val iv = Seq(("k1", 0L, 10L), ("k1", 5L, 15L), ("k1", 5L, 8L),
      ("k1", 15L, 20L), ("k2", 0L, 1L), ("k2", 1L, 2L))
      .toDF("k", "s", "e")
    val got = Intervals.peakConcurrency(iv, "k", "s", "e")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("k1" -> 3L, "k2" -> 1L))
  }

  test("throttle: first row per bucket survives carrying the suppressed count") {
    val ev = Seq((3L, "u1", "click", 100L), (1L, "u1", "click", 100L),
      (2L, "u1", "click", 150L), (4L, "u1", "view", 100L),
      (5L, "u2", "click", 100L)).toDF("id", "user", "typ", "t")
    // bucket = t div 100: u1/click bucket-1 has rows t=100(id 3,1),150(id 2)
    // -> survivor (t=100, id=1), n_suppressed=2
    val got = Throttle.keepFirst(ev, Seq("user", "typ"), "t", "id",
        c => floor(c / 100))
      .select("id", "n_suppressed")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 4L -> 0L, 5L -> 0L))
  }

  test("resample: silent days zero-filled over the global date range") {
    val ev = Seq(("a", "2024-01-01 10:00:00", 1.25),
      ("a", "2024-01-03 11:00:00", 2.50),
      ("b", "2024-01-02 09:00:00", 0.75))
      .toDF("k", "ts_s", "v")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Resample.dailySpineFill(ev, "k", "ts", "v")
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getLong(2), r.getLong(3))).toMap
    // spine is 2 keys x 3 days (global [01-01, 01-03]) = 6 rows
    assert(got.size == 6)
    assert(got(("a", "2024-01-01")) == ((1L, 125L)))
    assert(got(("a", "2024-01-02")) == ((0L, 0L))) // silent day zero-filled
    assert(got(("a", "2024-01-03")) == ((1L, 250L)))
    assert(got(("b", "2024-01-01")) == ((0L, 0L)))
    assert(got(("b", "2024-01-02")) == ((1L, 75L)))
    assert(got(("b", "2024-01-03")) == ((0L, 0L)))
  }

  test("contingency: 2x2 cell math matches the hand-computed chi-square") {
    // grid: (x,p)=10 (x,q)=20 (y,p)=30 (y,q)=40; N=100
    val rows = Seq.fill(10)(("x", "p")) ++ Seq.fill(20)(("x", "q")) ++
      Seq.fill(30)(("y", "p")) ++ Seq.fill(40)(("y", "q"))
    val df = rows.toDF("a", "b")
    val got = Contingency.chiSquare(df, "a", "b")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def cell(n: Long, rt: Long, ct: Long): (Long, Long, Long) = {
      val e = rt.toDouble * ct.toDouble / 100.0
      val d = n.toDouble - e
      (n, math.rint(e * 1e6).toLong, math.rint(d * d / e * 1e6).toLong)
    }
    assert(got == Map(
      ("x", "p") -> cell(10, 30, 40), ("x", "q") -> cell(20, 30, 60),
      ("y", "p") -> cell(30, 70, 40), ("y", "q") -> cell(40, 70, 60)))
    // exp: (x,p) e=12 -> d=-2, chi2 = 4/12
    assert(got(("x", "p"))._3 == math.rint(4.0 / 12.0 * 1e6).toLong)
  }

  test("psi: hand-computed smoothed bins; identical samples give zero drift") {
    import graft.operators.Drift
    val a = Seq(0.01, 0.02, 0.03, 0.10).toDF("v") // cents 1,2,3,10
    val b = Seq(0.01, 0.10, 0.10).toDF("v")
    // bounds [1,10], 2 bins, width expr: (c-1)*2 DIV 10 -> bin 0: c in
    // [1,5]; bin 1: c in [6,10]. a: (3,1), b: (1,2)
    val got = Drift.psi(a, b, "v", bins = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def term(nA: Long, nB: Long): Long = {
      val pA = (nA + 1.0) / 6.0; val pB = (nB + 1.0) / 5.0
      math.rint((pA - pB) * math.log(pA / pB) * 1e6).toLong
    }
    assert(got == Map(0L -> ((1L, 3L, 1L, term(3, 1))),
      1L -> ((6L, 1L, 2L, term(1, 2)))))
    // A/A: every per-bin term is exactly zero
    val aa = Drift.psi(a, a, "v", bins = 2).agg(sum("psi_micros")).head().getLong(0)
    assert(aa == 0L)
  }

  test("rrf: integer reciprocal ranks fuse and rank deterministically") {
    import graft.operators.RankFusion
    val docs = Seq((1L, "aaaa"), (2L, "bbb"), (3L, "cc")).toDF("doc_id", "text")
    // orderA: length desc -> 1,2,3; orderB: doc_id desc -> 3,2,1
    val got = RankFusion.rrf(docs, "doc_id",
        Seq(length(col("text")).desc, col("doc_id")),
        Seq(col("doc_id").desc), k = 60)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def m(r: Long) = 1000000L / (60L + r)
    // doc1: ranks (1,3) doc2: (2,2) doc3: (3,1); symmetric scores tie
    // 1 and 3 -> id tie-break
    assert(got(1L) == ((1L, 3L, m(1) + m(3), 1L)))
    assert(got(3L) == ((3L, 1L, m(3) + m(1), 2L)))
    assert(got(2L) == ((2L, 2L, 2 * m(2), 3L)))
  }

  test("exact auc: separable, anti-separable, tied and degenerate groups") {
    import graft.operators.ExactAuc
    val df = Seq(
      // g1: perfectly separable (pos scores all above) -> AUC 1
      ("g1", 0.10, 1L), ("g1", 0.09, 1L), ("g1", 0.02, 0L), ("g1", 0.01, 0L),
      // g2: reversed -> AUC 0
      ("g2", 0.10, 0L), ("g2", 0.01, 1L),
      // g3: all scores tied -> AUC exactly 1/2 via midranks
      ("g3", 0.05, 1L), ("g3", 0.05, 0L), ("g3", 0.05, 0L),
      // g4: no negatives -> NULL
      ("g4", 0.07, 1L)
    ).toDF("g", "score", "y")
    val got = ExactAuc.aucByGroup(df, "g", "score", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(got("g1") == ((2L, 2L, Some(1000000L))))
    assert(got("g2") == ((1L, 1L, Some(0L))))
    assert(got("g3") == ((1L, 2L, Some(500000L))))
    assert(got("g4") == ((1L, 0L, None)))
  }

  test("calibration bins: exact decile membership and per-bin label rates") {
    import graft.operators.Calibration
    // 20 rows, scores 1..20 cents, label = 1 for the top half
    val df = (1L to 20L).map(i => (i, i.toDouble / 100.0, if (i > 10) 1L else 0L))
      .toDF("id", "score", "y")
    val got = Calibration.bins(df, "id", "score", "y", bins = 10)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.size == 10)
    // bin b holds scores 2b-1, 2b: all-0 below bin 6, all-1 from bin 6
    for (b <- 1 to 5) assert(got(b) == ((2L, 0L, 0L, (2 * b * 100 - 50) * 10000L)))
    for (b <- 6 to 10) assert(got(b) == ((2L, 2L, 1000000L, (2 * b * 100 - 50) * 10000L)))
  }

  test("key skew: uniform keys near zero gini, one hot key dominates the shares") {
    import graft.operators.KeySkew
    // uniform: 10 keys x 10 rows
    val uni = (0L until 100L).map(i => i % 10).toDF("k")
    val u = KeySkew.profile(uni, "k").collect().head
    assert((u.getLong(1), u.getLong(2)) == ((10L, 100L)))
    assert(u.getLong(3) == 100000L) // max share 10%
    assert(u.getLong(4) == 1000000L) // 10 keys: top-10 covers everything
    assert(u.getLong(5) == 0L, s"uniform distribution must have zero gini: $u")
    // skewed: key 0 owns 91 of 100 rows
    val skew = ((0L until 91L).map(_ => 0L) ++ (1L to 9L)).toDF("k")
    val s = KeySkew.profile(skew, "k").collect().head
    assert((s.getLong(1), s.getLong(2)) == ((10L, 100L)))
    assert(s.getLong(3) == 910000L) // hot key: 91%
    // lorenz hand-check: counts asc = [1x9, 91]; sum i*c_i = 45 + 910
    val gini = math.rint((2.0 * (45 + 910) / (10.0 * 100) - 11.0 / 10) * 1e6).toLong
    assert(s.getLong(5) == gini, s"gini mismatch: ${s.getLong(5)} vs $gini")
  }

  test("mad outliers: hand medians, deviation median, 3xMAD flags") {
    import graft.operators.Robust
    // g: cents [10,10,20,30,200] -> n=5, med=elem[2]=20; devs sorted
    // [0,10,10,10,180] -> mad=elem[2]=10; outlier: |200-20|=180 > 30
    val df = Seq(("g", 0.10), ("g", 0.10), ("g", 0.20), ("g", 0.30),
      ("g", 2.00), ("h", 0.50)).toDF("k", "v")
    val got = Robust.madOutliers(df, "k", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("g") == ((5L, 20L, 10L, 1L)))
    // singleton: med = value, mad = 0, no row deviates from itself
    assert(got("h") == ((1L, 50L, 0L, 0L)))
  }

  test("mutual info: independent columns sum to ~zero, dependent to ln2") {
    import graft.operators.MutualInfo
    // dependent: b == a -> MI = H(a) = ln 2 for a uniform binary a
    val dep = Seq.fill(50)(("x", "x")) ++ Seq.fill(50)(("y", "y"))
    val miDep = MutualInfo.cells(dep.toDF("a", "b"), "a", "b")
      .agg(sum("mi_micros")).head().getLong(0)
    assert(miDep == 2 * math.rint(0.5 * math.log(2.0) * 1e6).toLong)
    // independent: all four cells equal -> each term exactly ln(1)=0
    val ind = Seq.fill(25)(("x", "p")) ++ Seq.fill(25)(("x", "q")) ++
      Seq.fill(25)(("y", "p")) ++ Seq.fill(25)(("y", "q"))
    val miInd = MutualInfo.cells(ind.toDF("a", "b"), "a", "b")
      .agg(sum("mi_micros")).head().getLong(0)
    assert(miInd == 0L)
  }

  test("ks: separable groups hit 1e6, uniform-tied hit 0, cross-multiplied exactly") {
    import graft.operators.ExactAuc
    val df = Seq(
      // g1: pos strictly above neg -> KS = 1
      ("g1", 0.10, 1L), ("g1", 0.09, 1L), ("g1", 0.02, 0L), ("g1", 0.01, 0L),
      // g2: identical score distributions -> KS = 0
      ("g2", 0.05, 1L), ("g2", 0.05, 0L),
      // g3: pos at {1,3}, neg at {2,4} cents: cdfs max gap 1/2
      ("g3", 0.01, 1L), ("g3", 0.02, 0L), ("g3", 0.03, 1L), ("g3", 0.04, 0L)
    ).toDF("g", "score", "y")
    val got = ExactAuc.ksByGroup(df, "g", "score", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("g1") == ((2L, 2L, 1000000L)))
    assert(got("g2") == ((1L, 1L, 0L)))
    assert(got("g3") == ((2L, 2L, 500000L)))
  }

  test("bpe: planted corpus yields the classic hand-computed merge sequence") {
    import graft.functions.BpeMerges
    // hug:3 pug:2 pun:1 bun:1 — r1 (u,g)=5; r2 (h,ug)=3;
    // r3 tie (p,ug)=2 vs (u,n)=2 -> lexicographic left wins: (p,ug)
    val docs = Seq((1L, "hug pug pun"), (2L, "bun hug HUG pug"))
      .toDF("doc_id", "text")
    val got = BpeMerges.topMerges(docs, "text", k = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.take(3).toSeq == Seq((1, "u", "g", 5L), (2, "h", "ug", 3L),
      (3, "p", "ug", 2L)), s"merge sequence wrong: ${got.toSeq}")
    // r4: remaining pairs (u,n)=2, (b,u)=1 -> (u,n)
    assert(got(3) == ((4, "u", "n", 2L)))
    // early stop: once no pair repeats, no further merges are emitted
    val tiny = Seq((1L, "ab cd")).toDF("doc_id", "text")
    assert(BpeMerges.topMerges(tiny, "text", k = 5).count() == 0)
    // astral characters stay WHOLE symbols (codepoints, not UTF-16
    // units): "🙂a 🙂a" must merge (🙂, a), never a surrogate half —
    // and it matches the DuckDB oracle's codepoint substr on the
    // bpe_first_merge gate
    val astral = Seq((1L, "🙂a 🙂a")).toDF("doc_id", "text")
    val am = BpeMerges.topMerges(astral, "text", k = 1)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(am.toSeq == Seq(("🙂", "a", 2L)), s"astral split wrong: ${am.toSeq}")
  }

  test("group quantiles: indexed order statistics on a hand-buildable group") {
    import graft.operators.GroupQuantiles
    // g: cents 1..100 (n=100): idx(q) = (num*99) DIV den; p25 idx24 -> 25
    val df = (1 to 100).map(i => ("g", i / 100.0)).toDF("k", "v")
    val got = GroupQuantiles.quantiles(df, "k", "v",
        Seq(("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4), ("p99", 99, 100)))
      .collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3), got.getLong(4),
      got.getLong(5)) == ((100L, 25L, 50L, 75L, 99L)))
    // heavy ties: median of [1,1,1,9] is the elem at idx 1 -> 1
    val ties = Seq(("t", 0.01), ("t", 0.01), ("t", 0.01), ("t", 0.09))
      .toDF("k", "v")
    val t = GroupQuantiles.quantiles(ties, "k", "v", Seq(("p50", 1, 2)))
      .collect().head
    assert(t.getLong(2) == 1L)
  }

  test("evolving merge: new column lands, old rows null-backfilled, compare includes it") {
    import graft.operators.MergeUpsert
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .withColumn("current_version", lit(1))
    // changeset: k=1 identical v but NEW column set -> must still version;
    // k=3 insert with the new column
    val cs = Seq((1L, "a", "gold", 1), (3L, "c", "silver", 1))
      .toDF("k", "v", "tier", "seq")
    val got = MergeUpsert.applyEvolving(target, cs, Seq("k"), "seq", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(r.fieldIndex("tier"))),
        r.getInt(r.fieldIndex("current_version")),
        r.getString(r.fieldIndex("change_type")))).toSet
    assert(got == Set(
      (1L, "a", None, 0, "expired"),          // differs ONLY in the new col
      (1L, "a", Some("gold"), 1, "update_new"),
      (2L, "b", None, 1, "unchanged"),
      (3L, "c", Some("silver"), 1, "insert")))
  }

  test("forward as-of: earliest later right row, inclusive ties, null when none follows") {
    import graft.operators.AsOfJoin
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 31L, "p3"),
      (2L, 5L, "p4")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r@10"), (1L, 30L, "r@30"))
      .toDF("k", "t", "payload")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "t", forward = true)
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(got == Map(
      "p1" -> Some("r@10"),  // equal ts is inclusive
      "p2" -> Some("r@30"),  // next later right
      "p3" -> None,          // nothing follows
      "p4" -> None))         // key absent on the right
  }

  test("kfold: folds partition each stratum, assignment is a pure id function") {
    import graft.operators.KFold
    val df = (1L to 1000L).map(i => (i, if (i % 4 == 0) "a" else "b"))
      .toDF("id", "s")
    val got = KFold.balance(df, "id", "s", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // every (stratum, fold) cell present; cells sum back to the stratum
    assert(got.keys.map(_._1).toSet == Set("a", "b"))
    for (s <- Seq("a", "b")) {
      val cells = got.filter(_._1._1 == s)
      assert(cells.keys.map(_._2).toSet == Set(0L, 1L, 2L, 3L, 4L))
      assert(cells.values.map(_._1).sum == cells.values.head._2)
    }
    // determinism: identical ids -> identical folds under repartitioning
    val again = KFold.balance(df.repartition(7), "id", "s", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(again == got)
  }

  test("bigram surprisal: conditional NLL matches a hand computation") {
    import graft.functions.NgramStats
    // corpus: d1 "a b a b", d2 "a c" -> bigrams: (a,b)x2, (b,a), (a,c)
    // ctx(a)=3, ctx(b)=1; V=3 (a,b,c)
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "solo"))
      .toDF("doc_id", "text")
    def nll(cxy: Long, cx: Long) =
      math.rint(-math.log((cxy + 1.0) / (cx + 4.0)) * 1e6).toLong // V=4 incl 'solo'
    val got = NgramStats.docBigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val d1 = 2 * nll(2, 3) + nll(1, 1)
    val d2 = nll(1, 3)
    assert(got == Map(1L -> ((3L, d1, d1 / 3)), 2L -> ((1L, d2, d2))),
      s"got $got")
    assert(!got.contains(3L), "single-token doc has no bigrams")
  }

  test("entity extraction: every occurrence lands with kind and ordinal") {
    import graft.functions.TextClean
    val docs = Seq(
      (1L, "mail a@b.co then c@d.org, see https://x.io/p?q=1 call 555-123-4567"),
      (2L, "nothing here")).toDF("doc_id", "text")
    val got = TextClean.extractEntities(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, "email", "a@b.co", 1L),
      (1L, "email", "c@d.org", 2L), // trailing comma not in the class
      (1L, "url", "https://x.io/p?q=1", 1L),
      (1L, "phone", "555-123-4567", 1L)), s"got $got")
  }

  test("dedup cluster stats: size histogram and corpus shares from planted dups") {
    import graft.dedup.ExactDedup
    // 3 copies of A, 2 of B, 1 of C -> sizes {3:1, 2:1, 1:1}, 6 docs
    val docs = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"),
      (6L, "C")).toDF("doc_id", "text")
    val got = ExactDedup.clusterStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      3L -> ((1L, 3L, 500000L)),
      2L -> ((1L, 2L, math.rint(2.0 / 6 * 1e6).toLong)),
      1L -> ((1L, 1L, math.rint(1.0 / 6 * 1e6).toLong))))
  }

  test("embed dim stats: exact quantized moments on a hand-built vector set") {
    import graft.operators.EmbedStats
    // dim0 quantized: floor(0.5*1000)=500, floor(-0.25*1000)=-250;
    // dim1: floor(1.0*1000)=1000, floor(0.999*1000)=998 (float32 0.999
    // is 0.99899995...; quantize matches floor on the double widening)
    val df = Seq(
      (1L, Seq(0.5f, 1.0f)),
      (2L, Seq(-0.25f, 0.999f))).toDF("vec_id", "embedding")
    val got = EmbedStats.dimStats(df, "embedding")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    def moments(a: Long, b: Long) = {
      val mean = (a + b) / 2.0
      val v = (a * a + b * b) / 2.0 - mean * mean
      (math.rint(mean * 1e6).toLong, math.rint(v * 1e6).toLong)
    }
    val (m0, v0) = moments(500L, -250L)
    assert(got(0) == ((2L, m0, v0, -250L, 500L)))
    val q1b = math.floor(0.999f.toDouble * 1000).toLong
    val (m1, v1) = moments(1000L, q1b)
    assert(got(1) == ((2L, m1, v1, q1b, 1000L)))
  }

  test("conversion lag: hour buckets from forward matches, unconverted in bucket -1") {
    import graft.operators.ConversionLag
    val h = 3600000000L
    val ev = Seq(
      (1L, 1L, 0L, "view"), (2L, 1L, h / 2, "purchase"),   // lag 30min -> bucket 0
      (3L, 1L, h, "view"), (4L, 1L, 4L * h, "purchase"),   // lag 3h -> bucket 3
      (5L, 2L, 0L, "view"),                                // never converts -> -1
      (6L, 3L, 0L, "purchase")                             // purchase w/o view: ignored
    ).toDF("event_id", "user_id", "us", "event_type")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = ConversionLag.lagHistogram(ev, "user_id", "ts", "event_type",
        "event_id", "view", "purchase", h)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 3L -> 1L, -1L -> 1L), s"got $got")
  }

  test("embed centering: per-dim integer means subtract out, sums go to ~zero") {
    import graft.operators.EmbedStats
    val df = Seq((1L, Seq(0.5f, 0.2f)), (2L, Seq(0.3f, 0.2f)),
      (3L, Seq(0.1f, 0.2f))).toDF("vec_id", "embedding")
    // dim0 q: 500,300,100 -> mean 300; dim1 q: 200x3 -> mean 200
    val got = EmbedStats.centered(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 0) -> 200L, (2L, 0) -> 0L, (3L, 0) -> -200L,
      (1L, 1) -> 0L, (2L, 1) -> 0L, (3L, 1) -> 0L))
  }

  test("exact auc: distributed midrank path equals brute-force pair counting on random data") {
    import graft.operators.ExactAuc
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    // 400 rows, scores drawn from only 20 values (heavy ties), random labels
    val rows = (0 until 400).map { i =>
      ("g", (math.abs(mix(i)) % 20L) / 100.0, math.abs(mix(i + 7777)) % 2L)
    }
    val got = ExactAuc.aucByGroup(rows.toDF("g", "score", "y"), "g", "score", "y")
      .collect().head.getLong(3)
    // independent formulation: P(pos > neg) + 0.5 P(tie) over ALL pairs
    val pos = rows.filter(_._3 == 1L).map(_._2)
    val neg = rows.filter(_._3 == 0L).map(_._2)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val want = math.rint(wins / (pos.size.toLong * neg.size) * 1e6).toLong
    assert(got == want, s"midrank AUC $got != pair-counting AUC $want")
  }

  test("entity resolution: transitive closure merges a-b and b-c into one entity") {
    val base = "0123456789abcdef" // 16-char prefix
    val docs = Seq(
      (1L, base + " tail one"),            // matches 2 (distance 0 prefix)
      (2L, base + " other tail"),          // matches 1 and 3
      (3L, "0123456789abcdeX trailing"),   // distance 1 from base prefix
      (4L, "completely different text!"),  // singleton
      (5L, "short")                        // < 16 chars: excluded from matching
    ).toDF("doc_id", "text")
    val got = EntityResolution.resolve(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1,2 share prefix exactly; 3 is one substitution away from 2's prefix
    // (transitively also 1) -> all label 1. 4 and 5 are their own entity.
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
  }
}
