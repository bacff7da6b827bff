package graft

import org.apache.spark.sql.functions._

/** Memorization window-rate audit on planted corpora. */
class MemorizationAuditSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    Tuple1(Seq("the", "quick", "brown", "fox", "jumps", "over", "the",
      "lazy", "dog"))
  ).toDF("toks")

  private def run(gens: Seq[(Long, String, Seq[String])], k: Int) =
    graft.operators.MemorizationAudit.audit(
      gens.toDF("id", "cls", "gen"), "id", "cls", col("gen"),
      corpus, col("toks"), k)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("verbatim slice hits every window; novel text hits none") {
    val got = run(Seq(
      (1L, "v", Seq("quick", "brown", "fox", "jumps", "over", "the")),
      (2L, "n", Seq("aa", "bb", "cc", "dd", "ee", "ff"))), k = 3)
    assert(got("v") === ((1L, 4L, 4L, 1000L)))
    assert(got("n") === ((1L, 4L, 0L, 0L)))
  }

  test("boundary windows spanning corpus and novel tokens do not hit") {
    // 4 corpus tokens + 2 novel at k=3: windows = 4; the 2 pure-corpus
    // windows hit, the 2 spanning ones do not
    val got = run(Seq(
      (1L, "m", Seq("the", "quick", "brown", "fox", "xx", "yy"))), k = 3)
    assert(got("m") === ((1L, 4L, 2L, 500L)))
  }

  test("generations shorter than k count with zero windows") {
    val got = run(Seq(
      (1L, "s", Seq("the", "quick")),
      (2L, "s", Seq("quick", "brown", "fox"))), k = 3)
    assert(got("s") === ((2L, 1L, 1L, 1000L)))
  }

  test("gated instance: class rates are ordered verbatim > mixed > novel = 0") {
    val got = graft.operators.MemorizationAudit.memorizationDocs(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(got("verbatim") === 1000L)
    assert(got("novel") === 0L)
    assert(got("mixed") > 0L && got("mixed") < 1000L)
  }
}
