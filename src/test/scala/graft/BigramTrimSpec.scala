package graft

import org.apache.spark.sql.functions._
import graft.functions.NgramStats
import graft.operators.Robust

class BigramTrimSpec extends SparkSpec {
  import spark.implicits._

  test("Kneser-Ney: hand-walked probabilities on 'a b a b a c'") {
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val got = NgramStats.kneserNeyBigrams(docs, "doc_id", "text", 1L)
      .select($"w1", $"w2", $"pkn_permicro").as[(String, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    // bc: (a,b)=2 (b,a)=2 (a,c)=1; c1(a)=3 nf(a)=2; nb all 1; nAll=3
    // P(b|a) = (2-3/4)/3 + (3/4)(2/3)(1/3) = 5/12 + 1/6
    assert(got(("a", "b")) === 416666L + 166666L)
    // P(c|a) = (1-3/4)/3 + 1/6 = 1/12 + 1/6
    assert(got(("a", "c")) === 83333L + 166666L)
    // P(a|b) = (2-3/4)/2 + (3/4)(1/2)(1/3) = 5/8 + 1/8
    assert(got(("b", "a")) === 625000L + 125000L)
  }

  test("Kneser-Ney: continuation probability penalizes one-context words") {
    // z1 follows ONLY q; z2 follows q the same number of times but
    // also appears after three other contexts -> same raw conditional,
    // HIGHER KN probability for z2 (the san-francisco effect)
    val docs = Seq(
      (1L, Seq.fill(5)("q z1").mkString(" . ")),
      (2L, Seq.fill(5)("q z2").mkString(" . ")),
      (3L, "u z2 . v z2 . w z2")
    ).toDF("doc_id", "text")
    val got = NgramStats.kneserNeyBigrams(docs, "doc_id", "text", 1L)
      .select($"w1", $"w2", $"c12", $"pkn_permicro")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val (c1, p1) = got(("q", "z1"))
    val (c2, p2) = got(("q", "z2"))
    assert(c1 == c2, "raw bigram counts identical by construction")
    assert(p2 > p1, "more continuation contexts must raise the KN prob")
  }

  test("bigram next: argmax continuation with count-then-token order") {
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog sat"),
      (4L, "the cat"), (5L, "a cat")
    ).toDF("doc_id", "text")
    val got = NgramStats.bigramNext(docs, "doc_id", "text", v = 10)
      .select($"w1", $"w1_n", $"next_tok", $"pair_n", $"cond_permille")
      .as[(String, Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // "the" → cat 3×, dog 1× ⇒ next = cat, 750‰
    assert(got("the") === ((4L, "cat", 3L, 750L)))
    // "cat" → sat 1×, ran 1× ⇒ tie broken by token order: ran
    assert(got("cat") === ((2L, "ran", 1L, 500L)))
  }

  test("bigram gated instance: probabilities valid, vocab bounded") {
    val got = NgramStats.bigramNextDocs(spark, sfDir)
    assert(got.count() <= 200)
    assert(got.filter($"cond_permille" < 0 || $"cond_permille" > 1000).isEmpty)
    assert(got.filter($"pair_n" > $"w1_n").isEmpty)
  }

  test("trimmed mean: hand histogram with partial boundary cells") {
    // 10 values: one low outlier, one high outlier, bulk at 10
    val df = Seq(("g", -1000L), ("g", 10L), ("g", 10L), ("g", 10L),
      ("g", 10L), ("g", 10L), ("g", 10L), ("g", 10L), ("g", 10L),
      ("g", 5000L)).toDF("grp", "v")
    // 100‰ trim: k = 1 from each end drops exactly both outliers
    val got = Robust.trimmedMean(df, "grp", "v", trimPermille = 100L)
      .select($"n", $"k_trim", $"trimmed_mean_micros")
      .as[(Long, Long, Long)].head()
    assert(got === ((10L, 1L, 10000000L)))
  }

  test("trimmed mean: zero trim equals the exact mean") {
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L)).toDF("grp", "v")
    val got = Robust.trimmedMean(df, "grp", "v", trimPermille = 0L)
      .select($"trimmed_mean_micros").as[Long].head()
    assert(got === 2000000L)
  }

  test("trimmed mean gated instance: trimmed within min/max, 3 groups") {
    val got = Robust.trimmedMeanLineitem(spark, sfDir)
      .select($"grp", $"n", $"k_trim", $"trimmed_mean_micros")
      .as[(String, Long, Long, Long)].collect()
    assert(got.length === 3)
    got.foreach { r => assert(r._3 === r._2 * 50 / 1000) }
  }
}
