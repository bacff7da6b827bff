package graft

import org.apache.spark.sql.functions._
import graft.functions.NgramStats
import graft.operators.Robust

class BigramTrimSpec extends SparkSpec {
  import spark.implicits._

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
