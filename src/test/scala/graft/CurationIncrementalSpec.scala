package graft

import org.apache.spark.sql.functions._
import graft.operators.CurationIncremental

/** Incremental curation: registry hits, within-batch dedup, no-op
  * resubmission. */
class CurationIncrementalSpec extends SparkSpec {
  import spark.implicits._

  // long, clean, stopword-rich text that clears the 0.45 quality
  // floor; the tag appears in EVERY 8-token window so distinct tags
  // never share an 8-gram (decontamination stays doc-specific)
  private def good(tag: String): String =
    (1 to 40).map(i => s"the $tag word${i}a of $tag and word${i}b is $tag to")
      .mkString(" ")

  private val benchEmpty = Seq.empty[(Long, String)]
    .toDF("doc_id", "text")

  test("registry fingerprints lose; within-batch dup keeps first id") {
    val registryDocs = Seq((2L, good("standing"))).toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val batch = Seq(
      (11L, good("standing"), "s", "en"), // registry hit -> dropped
      (13L, good("fresh"), "s", "en"),    // novel
      (15L, good("fresh"), "s", "en"))    // in-batch dup of 13 -> dropped
      .toDF("doc_id", "text", "source", "lang")
    val (acct, dec) = CurationIncremental.curateBatch(
      batch, registryDocs, benchEmpty)
    val m = acct.map(t => t._2 -> ((t._3, t._4))).toMap
    assert(m("quality_floor") === ((3L, 3L)))
    assert(m("dedup_registry") === ((3L, 1L)))
    assert(m("decontaminate") === ((1L, 1L)))
    assert(dec.select("doc_id").as[Long].collect().toSeq === Seq(13L))
  }

  test("re-submitted batch is a no-op against the updated registry") {
    val batch = Seq(
      (21L, good("alpha"), "s", "en"),
      (23L, good("beta"), "s", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "fp")
    val (_, accepted1) = CurationIncremental.curateBatch(
      batch, empty.select("fp"), benchEmpty)
    val registry = accepted1.select(col("doc_id"),
      graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    // redelivery of the identical batch: everything hits the registry
    val (acct2, accepted2) = CurationIncremental.curateBatch(
      batch, registry, benchEmpty)
    val m = acct2.map(t => t._2 -> ((t._3, t._4))).toMap
    assert(m("dedup_registry") === ((2L, 0L)))
    assert(accepted2.count() === 0L)
  }

  test("benchmark members and gram-contaminated docs drop in stage 3") {
    val benchText = good("bench")
    val bench = Seq((17L, benchText)).toDF("doc_id", "text")
    val batch = Seq(
      (36L, benchText + " trailing extra", "s", "en"), // shares 8-grams, 36%17!=0
      (35L, good("clean"), "s", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "fp")
    val (acct, dec) = CurationIncremental.curateBatch(
      batch, empty.select("fp"), bench)
    val m = acct.map(t => t._2 -> ((t._3, t._4))).toMap
    assert(m("decontaminate") === ((2L, 1L)))
    assert(dec.select("doc_id").as[Long].collect().toSeq === Seq(35L))
  }
}
