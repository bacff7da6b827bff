package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.dedup.ExactDedup

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "c b a")
    ).toDF("doc_id", "text")
    val fp = df.select($"doc_id", TextFunctions.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L), "identical text must fingerprint identically")
    assert(fp(1L) != fp(3L), "reordered text must fingerprint differently")
  }

  test("compiled fingerprint equals the expression form, incl. edge cases") {
    val edges = Seq((1000001L, ""), (1000002L, "  leading"), (1000003L, "trailing  "),
      (1000004L, "   "), (1000005L, "one"), (1000006L, "tabs\tand\nnewlines"))
      .toDF("doc_id", "text")
    val df = Tables.documents(spark, sfDir).select("doc_id", "text")
      .unionByName(edges)
    val diff = df.select(
        TextFunctions.fingerprint($"text").as("fast"),
        TextFunctions.fingerprintExpr($"text").as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(diff == 0, s"$diff rows disagree between compiled and expression fingerprint")
  }

  test("registered SQL functions work from spark.sql") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT graft_poly_fingerprint('a b c') AS fp, " +
        "graft_long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS dot, " +
        "graft_simhash64(array(7L)) AS sh, " +
        "size(graft_minhash_signature(array(7L, 8L))) AS sig_len").head()
    val ref = Seq(("a b c", 1)).toDF("text", "x")
      .select(TextFunctions.fingerprintExpr($"text")).head().getLong(0)
    assert(r.getLong(0) == ref)
    assert(r.getLong(1) == 32L)
    assert(r.getLong(2) == 7L) // single token: fingerprint = its own bits
    assert(r.getInt(3) == graft.dedup.MinHashLsh.SigLen)
    // wrong-typed SQL args must fail analysis, not read garbage
    val err = intercept[Exception](
      spark.sql("SELECT graft_long_array_dot(array(1, 2), array(3, 4))").collect())
    assert(err.getMessage.contains("array<bigint>"), err.getMessage)
  }

  test("token counts match on a known sentence") {
    val df = Seq((1L, "the quick brown fox, version 2")).toDF("doc_id", "text")
    val r = df.select(
      size(TextFunctions.words($"text")).as("ws"),
      size(TextFunctions.reTokens($"text")).as("re")).head()
    assert(r.getInt(0) == 6)            // whitespace tokens
    assert(r.getInt(1) == 7)            // the,quick,brown,fox,',',version,2
  }

  test("langid prefers the language with most marker hits") {
    val df = Seq(
      (1L, "the cat is on the mat and a dog", "x"),
      (2L, "le chat et la porte des les une", "x")
    ).toDF("doc_id", "text", "lang")
    val tmp = "/tmp/graft_textspec"
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextFunctions.textLangid(spark, tmp)
      .select($"doc_id", $"pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "fr")
  }

  test("exact dedup keeps min id per identical content") {
    val docs = Seq(
      (10L, "same text"), (3L, "same text"), (7L, "unique text")
    ).toDF("doc_id", "text")
    val g = ExactDedup.groups(docs, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(g(3L) == 2L, "dup group keeps id 3 with count 2")
    assert(g(7L) == 1L)
    assert(ExactDedup.dedup(docs, "doc_id", "text").count() == 2)
  }

  test("pii redact masks emails, ssns and phones with counts") {
    val docs = Seq(
      (1L, "mail a.b+c@test-host.org and b@x.io, ssn 123-45-6789, tel 555-123-4567"),
      (2L, "no pii here, just 12-34 and version 1.2.3")
    ).toDF("doc_id", "text")
    val out = graft.functions.TextClean.redact(docs, "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Int]("n_emails"), r.getAs[Int]("n_ssns"),
          r.getAs[Int]("n_phones"), r.getAs[String]("redacted"))).toMap
    assert(out(1L)._1 == 2 && out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(1L)._4 ==
      "mail [EMAIL] and [EMAIL], ssn [SSN], tel [PHONE]")
    assert(out(2L) == ((0, 0, 0, "no pii here, just 12-34 and version 1.2.3")))
  }

  test("normalize lowers, strips punctuation, collapses whitespace; idempotent") {
    val docs = Seq((1L, "  Hello,   WORLD!! x_1\t(two)\n"), (2L, "...")).toDF("doc_id", "text")
    val once = graft.functions.TextClean.normalize(docs, "text")
    val got = once.collect().map(r => r.getLong(0) ->
      (r.getAs[String]("norm_text"), r.getAs[Int]("n_norm_tokens"))).toMap
    assert(got(1L) == (("hello world x 1 two", 5)))
    assert(got(2L) == (("", 0)), "pure-punct doc normalizes to empty, 0 tokens")
    // idempotence: normalizing the normalized column changes nothing
    val twice = graft.functions.TextClean
      .normalize(once.withColumnRenamed("norm_text", "t2"), "t2")
      .where($"t2" =!= $"norm_text").count()
    assert(twice == 0L)
  }

  test("quality filter flags each rule with auditable reasons") {
    // 3 stopwords + 32 distinct words: 35 tokens, uniq 1.0, stop 3/35
    val good = "the a of " + (1 to 32).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, good),                                     // passes everything
      (2L, ("word " * 40).trim),                      // repetitive + no stopwords
      (3L, "the of and is to a in ok")                // short (8 tokens)
    ).toDF("doc_id", "text")
    val out = graft.functions.TextClean.qualityFilter(docs, "text")
      .select($"doc_id", $"keep", $"drop_reasons")
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(out(1L) == ((true, "")))
    assert(!out(2L)._1 && out(2L)._2 == "repetitive,no_stopwords")
    assert(!out(3L)._1 && out(3L)._2 == "short")
  }
}
