package graft

import org.apache.spark.sql.functions._

/** Attention-mask feature prep: sentinel normalization, masks, fills. */
class AttnMaskSpec extends SparkSpec {
  import spark.implicits._

  test("string sentinel, string null, numeric null: mask 0 + typed fill") {
    val df = Seq(
      (1L, Some("a"), Some(5L)),
      (2L, Some("<missing>"), None),
      (3L, None, Some(0L))
    ).toDF("id", "INPUT_s", "INPUT_n")
    val out = graft.operators.AttnMask.attnMaskPrep(df,
      Seq("INPUT_s", "INPUT_n"))
      .orderBy("id")
      .collect()
    assert(out(0).getString(1) === "a" && out(0).getInt(2) === 1)
    assert(out(0).getLong(3) === 5L && out(0).getInt(4) === 1)
    // literal sentinel normalizes to absent, then refills to sentinel
    assert(out(1).getString(1) === "<missing>" && out(1).getInt(2) === 0)
    assert(out(1).getLong(3) === 0L && out(1).getInt(4) === 0)
    assert(out(2).getString(1) === "<missing>" && out(2).getInt(2) === 0)
    // a REAL zero is present (mask 1) — fill never shadows data
    assert(out(2).getLong(3) === 0L && out(2).getInt(4) === 1)
  }

  test("non-input columns pass through; unsupported type fails loudly") {
    val df = Seq((1L, "x", java.sql.Date.valueOf("2024-01-01")))
      .toDF("id", "INPUT_s", "d")
    val out = graft.operators.AttnMask.attnMaskPrep(df, Seq("INPUT_s"))
    assert(out.columns.toSeq === Seq("id", "INPUT_s", "INPUT_s_attnmask", "d"))
    intercept[IllegalArgumentException] {
      graft.operators.AttnMask.attnMaskPrep(df, Seq("d"))
    }
  }

  test("gated instance: masks match the planted missingness pattern") {
    val out = graft.operators.AttnMask.attnMaskCustomer(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val k = r.getLong(0)
      assert(r.getInt(2) === (if (k % 11 == 0) 0 else 1))
      assert(r.getInt(4) === (if (k % 7 == 0) 0 else 1))
      assert(r.getInt(6) === (if (k % 13 == 0) 0 else 1))
      if (k % 7 == 0) assert(r.getString(3) === "<missing>")
      if (k % 11 == 0) assert(r.getLong(1) === 0L)
    }
  }
}
