package graft

import org.apache.spark.sql.functions._
import graft.operators.ImportanceSelect

/** DSIR-style selection must rank in-domain-looking docs above
  * out-of-domain ones, accept deterministically by the portable bucket
  * draw, and keep everything on a degenerate (uniform) corpus. */
class ImportanceSelectSpec extends SparkSpec {
  import spark.implicits._

  test("target-vocabulary docs score higher than off-domain docs") {
    // target domain speaks {alpha beta gamma}; raw pool adds docs
    // speaking {xx yy zz}; a mixed doc sits between
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta gamma alpha beta", true),
      (2L, "beta gamma alpha beta gamma alpha beta gamma", true),
      (10L, "alpha beta gamma alpha beta gamma beta alpha", false),
      (11L, "xx yy zz xx yy zz xx yy", false),
      (12L, "alpha beta xx yy zz gamma xx yy", false)
    ).toDF("doc_id", "text", "tgt")
    val out = ImportanceSelect.importanceSelect(docs, "doc_id", "text",
        col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(10L) > out(11L),
      s"in-domain text must outscore off-domain: $out")
    assert(out(10L) > out(12L) && out(12L) > out(11L),
      s"the mixed doc must sit between: $out")
  }

  test("degenerate corpus (all scores equal) keeps everything") {
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val out = ImportanceSelect.importanceSelect(docs, "doc_id", "text",
        col("doc_id") === 1L)
      .collect()
    assert(out.forall(_.getBoolean(3)), "max = min must accept all")
  }

  test("acceptance replays the portable bucket rule exactly") {
    val docs = Seq(
      (1L, "alpha alpha alpha alpha"), (2L, "alpha alpha zz zz"),
      (3L, "zz zz zz zz"), (4L, "alpha zz zz zz"),
      (5L, "alpha alpha alpha zz")
    ).toDF("doc_id", "text")
    val rows = ImportanceSelect.importanceSelect(docs, "doc_id", "text",
        col("doc_id") <= 2L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    val (mn, mx) = (rows.map(_._2).min, rows.map(_._2).max)
    def bucket(id: Long) =
      (((id % 100003L) * 1103515245L + 12345L) % 1000000L + 1000000L) % 1000000L
    rows.foreach { case (id, imp, sel) =>
      val expect = mx == mn || bucket(id) * (mx - mn) < (imp - mn) * 1000000L
      assert(sel == expect, s"doc $id: selected=$sel expected=$expect")
    }
    // the max-importance doc is always kept (imp−mn = range beats any
    // bucket < 1e6); the min-importance doc never is (0 < nothing)
    assert(rows.find(_._2 == mx).get._3)
    assert(!rows.find(_._2 == mn).get._3 || mx == mn)
  }

  test("gated instance: full corpus coverage, schema, n_tokens sane") {
    val out = ImportanceSelect.importanceSelectDocs(spark, sfDir)
      .localCheckpoint()
    assert(out.columns.toSeq ==
      Seq("doc_id", "n_tokens", "importance_micros", "selected"))
    assert(out.count() == Tables.documents(spark, sfDir).count())
    assert(out.filter(col("n_tokens") <= 0).count() == 0)
    // selection is nontrivial on the synthetic corpus: some in, some out
    val sel = out.filter(col("selected")).count()
    assert(sel > 0 && sel < out.count(), s"degenerate selection: $sel")
  }
}
