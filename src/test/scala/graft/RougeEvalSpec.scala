package graft

import org.apache.spark.sql.functions._

/** ROUGE-1 clipped-unigram scoring on hand pairs. */
class RougeEvalSpec extends SparkSpec {
  import spark.implicits._

  test("clipping caps repeated prediction tokens at the gold count") {
    // pred [a,a,b] vs gold [a,b,b]: clip = min(2,1)+min(1,2) = 2
    val pairs = Seq((1L, "x", Seq("a", "a", "b"), Seq("a", "b", "b")))
      .toDF("id", "cls", "pred", "gold")
    val r = graft.operators.RougeEval
      .rouge1Pooled(pairs, "id", "cls", col("pred"), col("gold"))
      .collect()(0)
    assert(r.getLong(2) === 2L) // clipped
    assert(r.getLong(5) === 666666L) // prec 2/3
    assert(r.getLong(6) === 666666L) // recall 2/3
    assert(r.getLong(7) === 666666L) // f1 4/6
  }

  test("disjoint tokens score zero; exact match scores one") {
    val pairs = Seq(
      (1L, "dis", Seq("x", "y"), Seq("a", "b")),
      (2L, "ex", Seq("a", "b", "c"), Seq("a", "b", "c"))
    ).toDF("id", "cls", "pred", "gold")
    val got = graft.operators.RougeEval
      .rouge1Pooled(pairs, "id", "cls", col("pred"), col("gold"))
      .collect().map(r => r.getString(0) -> (r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
    assert(got("dis") === ((0L, 0L, 0L)))
    assert(got("ex") === ((1000000L, 1000000L, 1000000L)))
  }

  test("pooling is micro-average: long docs weigh more than short") {
    // class with one perfect 8-token doc and one fully-wrong 2-token
    // doc: pooled prec = 8/10, NOT mean(1, 0) = 0.5
    val pairs = Seq(
      (1L, "m", Seq.fill(8)("a"), Seq.fill(8)("a")),
      (2L, "m", Seq("x", "y"), Seq("p", "q"))
    ).toDF("id", "cls", "pred", "gold")
    val r = graft.operators.RougeEval
      .rouge1Pooled(pairs, "id", "cls", col("pred"), col("gold"))
      .collect()(0)
    assert(r.getLong(5) === 800000L)
  }

  test("rouge2: order sensitivity — unigram-perfect reversal scores zero bigrams") {
    val got = graft.operators.RougeEval.rouge2Docs(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("dup_half", "subst3", "head5", "exact"))
    assert(got("exact").getLong(7) === 1000000L)
    // the dup seam bigram (last||first of the half) misses: prec < 1
    assert(got("dup_half").getLong(5) < 1000000L)
    // truncation keeps bigram precision 1 (a contiguous prefix)
    assert(got("head5").getLong(5) === 1000000L)
    // rouge2 recall can only be <= rouge1 recall per class
    val r1 = graft.operators.RougeEval.rouge1Docs(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(6)).toMap
    got.foreach { case (c, r) => assert(r.getLong(6) <= r1(c) + 1) }
  }

  test("gen_diversity: duplication halves distinct mass, permille exact") {
    val got = graft.operators.RougeEval.genDiversityDocs(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(got.keySet === Set("dup_half", "subst3", "head5", "exact"))
    got.foreach { case (_, (n1, d1, p1, n2, d2, p2)) =>
      assert(d1 <= n1 && d2 <= n2)
      assert(p1 === 1000L * d1 / n1 && p2 === 1000L * d2 / n2)
    }
    // cross-class permilles are NOT comparable (pool sizes differ) —
    // the hand check below pins the metric itself
    val hand = graft.operators.RougeEval.genDiversity(
      Seq(("x", Seq("a", "a", "b")), ("y", Seq("a", "b", "c")))
        .toDF("cls", "toks"),
      "cls", col("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getLong(6))).toMap
    // x: distinct-1 = 2/3; bigrams [a a, a b] distinct 2/2
    assert(hand("x") === ((666L, 1000L)))
    assert(hand("y") === ((1000L, 1000L)))
  }

  test("rougeL: transposition costs exactly one token, not a bigram break") {
    // pred = gold with tokens 2,3 swapped: LCS = n - 1 (drop one of the
    // swapped pair); rouge2 would lose up to 3 bigrams at the seam
    val pairs = Seq(
      (1L, "tr", Seq("a", "c", "b", "d", "e"), Seq("a", "b", "c", "d", "e")),
      (2L, "ex", Seq("x", "y", "z"), Seq("x", "y", "z")),
      (3L, "dis", Seq("p", "q"), Seq("r", "s")))
      .toDF("id", "cls", "pred", "gold")
    val got = graft.operators.RougeEval
      .rougeLPooled(pairs, "id", "cls", col("pred"), col("gold"), cap = 40)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(5)))).toMap
    assert(got("tr") === ((4L, 800000L))) // LCS 4 of 5
    assert(got("ex") === ((3L, 1000000L)))
    assert(got("dis") === ((0L, 0L)))
  }

  test("rougeL: cap truncates both sides; order beyond adjacency is rewarded") {
    // interleaved-but-ordered subsequence: rouge2 = 0, rougeL = 3
    val pairs = Seq(
      (1L, "sub", Seq("a", "x", "b", "y", "c"), Seq("a", "b", "c")))
      .toDF("id", "cls", "pred", "gold")
    val l = graft.operators.RougeEval
      .rougeLPooled(pairs, "id", "cls", col("pred"), col("gold"), cap = 40)
      .collect()(0)
    assert(l.getLong(2) === 3L)
    val capped = graft.operators.RougeEval
      .rougeLPooled(pairs, "id", "cls", col("pred"), col("gold"), cap = 2)
      .collect()(0)
    assert(capped.getLong(3) === 2L && capped.getLong(4) === 2L) // lens capped
    assert(capped.getLong(2) === 1L) // LCS of [a,x] vs [a,b]
  }

  test("lcs_length kernel: classic cases incl. empties and repeats") {
    val df = Seq(
      (Seq("a", "b", "c", "d"), Seq("a", "c", "b", "d"), 3L),
      (Seq.empty[String], Seq("a"), 0L),
      (Seq("a"), Seq.empty[String], 0L),
      (Seq("a", "a", "b", "a"), Seq("a", "b", "a", "a"), 3L),
      (Seq("q"), Seq("q"), 1L))
      .toDF("a", "b", "want")
    val got = df.select(
      graft.functions.Native.call("graft_lcs_length",
        e => graft.functions.LcsLength(e(0), e(1)), col("a"), col("b"))
        .as("lcs"), col("want")).collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("gated instance: class invariants hold") {
    val got = graft.operators.RougeEval.rouge1Docs(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet === Set("dup_half", "subst3", "head5", "exact"))
    val exact = got("exact")
    assert(exact.getLong(5) === 1000000L && exact.getLong(6) === 1000000L)
    val head5 = got("head5")
    assert(head5.getLong(5) === 1000000L, "truncation keeps precision 1")
    assert(head5.getLong(6) < 1000000L, "truncation loses recall")
    val dup = got("dup_half")
    assert(dup.getLong(5) < 1000000L, "duplicated half is clipped")
    val sub = got("subst3")
    assert(sub.getLong(5) < 1000000L && sub.getLong(6) < 1000000L)
  }
}
