package graft

/** Water-filling epoch allocation on hand source tables. */
class EpochPlanSpec extends SparkSpec {
  import spark.implicits._

  private def run(us: Seq[(String, Long)], budget: Long, cap: Int) =
    graft.operators.EpochPlan.plan(us.toDF("source", "toks"),
      "source", "toks", budget, cap)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap

  test("hand water-fill: small source caps, large ones share the level") {
    // U = (10, 100, 100), R = 4 -> C = (40, 400, 400); B = 340
    // small capped (40 <= 340 - level feasibility), remaining 300 / 2 = 150
    val got = run(Seq(("s", 10L), ("a", 100L), ("b", 100L)), 340L, 4)
    assert(got("s") === ((40L, 4000L, true)))
    assert(got("a") === ((150L, 1500L, false)))
    assert(got("b") === ((150L, 1500L, false)))
  }

  test("budget above total capacity caps everything at R epochs") {
    val got = run(Seq(("a", 10L), ("b", 20L)), 1000L, 4)
    assert(got("a") === ((40L, 4000L, true)))
    assert(got("b") === ((80L, 4000L, true)))
  }

  test("tiny budget caps nothing and splits evenly with floors") {
    // B = 25 over 3 sources -> level 8 each, 1 token unallocated
    val got = run(Seq(("a", 100L), ("b", 100L), ("c", 100L)), 25L, 4)
    assert(got.values.forall(_ == ((8L, 80L, false))))
  }

  test("allocation never exceeds capacity or the budget") {
    val us = Seq(("a", 7L), ("b", 19L), ("c", 151L), ("d", 3L))
    for (b <- Seq(0L, 50L, 300L, 10000L)) {
      val got = run(us, b, 4)
      val total = got.values.map(_._1).sum
      assert(total <= b || got.values.forall(_._3),
        s"budget $b: allocated $total")
      us.foreach { case (s, u) => assert(got(s)._1 <= 4L * u) }
    }
  }

  test("materialize: copies = whole epochs + thresholded fractional draw") {
    import org.apache.spark.sql.functions._
    // one source, U = 30, alloc = 75 -> full = 2, rem = 15, thr = 500000
    val docs = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L))
      .toDF("id", "src", "toks")
    val planned = Seq(("a", 30L, 120L, 75L, 2500L, false))
      .toDF("source", "unique_tokens", "capacity_tokens", "alloc_tokens",
        "epochs_permille", "capped")
    val out = graft.operators.EpochPlan
      .materialize(docs, "id", "src", "toks", planned)
      .groupBy("id").agg(count(lit(1)).as("n"), max("copy_idx").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every doc gets >= 2 copies; the fractional third copy follows the
    // portable bucket draw at threshold 500000
    out.foreach { case (id, (n, mx)) =>
      val bucket = ((id % 100003L) * 1103515245L + 12345L) % 1000000L
      val want = 2L + (if (((bucket % 1000000L) + 1000000L) % 1000000L < 500000L) 1L else 0L)
      assert(n === want && mx === want, s"doc $id")
    }
  }

  test("gated instance: both branches present, allocation ties out") {
    val rows = graft.operators.EpochPlan.epochPlanDocs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getBoolean(5)) && rows.exists(!_.getBoolean(5)),
      "budget 3.9x at cap 4 must cap some sources and fill others")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "alloc <= capacity")
      assert(r.getLong(4) <= 4000L, "epochs <= cap")
    }
  }
}
