package graft

import org.apache.spark.sql.functions._
import graft.ml.NaiveBayes

/** Multinomial NB: hand-computable planted corpus classifies by the
  * dominant bigram, OOV-only docs drop, and the gated instance emits a
  * well-formed confusion matrix over the real label set. */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  test("planted two-class corpus: each test doc joins its gram's class") {
    val df = Seq(
      (1L, "aa", "aaaa", "tr"), (2L, "aa", "aaa", "tr"),
      (3L, "bb", "bbbb", "tr"), (4L, "bb", "bbb", "tr"),
      (5L, "aa", "aab", "te"), (6L, "bb", "bba", "te"))
      .toDF("id", "lang", "text", "split")
    val out = NaiveBayes.confusion(df, "id", "lang", "text",
      col("split") === "tr").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("aa", "aa") -> 1L, ("bb", "bb") -> 1L))
  }

  test("test docs with only out-of-vocabulary grams are excluded") {
    val df = Seq(
      (1L, "aa", "aaaa", "tr"), (2L, "bb", "bbbb", "tr"),
      (3L, "aa", "xyz", "te")) // grams xy, yz: neither in train vocab
      .toDF("id", "lang", "text", "split")
    val out = NaiveBayes.confusion(df, "id", "lang", "text",
      col("split") === "tr")
    assert(out.count() === 0L)
  }

  test("priors break a feature tie toward the larger class") {
    // identical gram profile in both classes, 3 vs 1 train docs
    val df = Seq(
      (1L, "big", "cc", "tr"), (2L, "big", "cc", "tr"),
      (3L, "big", "cc", "tr"), (4L, "sml", "cc", "tr"),
      (5L, "sml", "cc", "te"))
      .toDF("id", "lang", "text", "split")
    val out = NaiveBayes.confusion(df, "id", "lang", "text",
      col("split") === "tr").collect()
    assert(out.length === 1)
    assert(out.head.getString(1) === "big") // prior ln(3/4) > ln(1/4)
  }

  test("gated instance: well-formed confusion over the sf0.001 label set") {
    val out = NaiveBayes.nbLangDocuments(spark, sfDir)
    val rows = out.collect()
    val langs = Tables.documents(spark, sfDir)
      .select("lang").distinct().as[String].collect().toSet
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(langs.contains(r.getString(0)) && langs.contains(r.getString(1)))
      assert(r.getLong(2) > 0L)
    }
    // every scored doc lands in exactly one cell: total <= test-split docs
    val testDocs = Tables.documents(spark, sfDir)
      .filter(graft.operators.Sampling.portableBucket(col("doc_id")) >= 800000L)
      .count()
    assert(rows.map(_.getLong(2)).sum <= testDocs)
  }
}
