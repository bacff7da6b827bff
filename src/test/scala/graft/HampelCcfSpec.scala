package graft

import graft.operators.{CrossCorr, Hampel}
import org.apache.spark.sql.functions._

/** Planted contracts: Hampel flags a spike against a flat window and
  * stays quiet inside the MAD band; CCF recovers a planted 2-day lead
  * and is ~1 at lag 0 for identical series. */
class HampelCcfSpec extends SparkSpec {
  import spark.implicits._

  test("hampel: a spike in a flat series flags, edges stay NULL") {
    val days = (1 to 15).map(i => (f"2024-01-$i%02d",
      if (i == 8) 1000L else 100L))
    val df = days.toDF("d", "v").select(to_date(col("d")).as("day"),
      col("v")).withColumn("g", lit("s"))
    val out = Hampel.filter(df, "g", "day", "v")
      .orderBy("day").collect()
    // rows 1..3 and 13..15 have partial windows → NULL flag
    assert(out.take(3).forall(_.isNullAt(out(0).fieldIndex("is_outlier"))))
    assert(out.takeRight(3).forall(_.isNullAt(out(0).fieldIndex("is_outlier"))))
    val spike = out(7)
    assert(spike.getAs[Long]("v") == 1000L)
    assert(spike.getAs[Long]("med") == 100L && spike.getAs[Long]("mad") == 0L)
    assert(spike.getAs[Boolean]("is_outlier"),
      "900 cents off a zero-MAD window must flag")
    assert(out.zipWithIndex.filter { case (_, i) => i >= 3 && i <= 11 && i != 7 }
      .forall(!_._1.getAs[Boolean]("is_outlier")))
  }

  test("hampel: deviations inside k*MAD stay unflagged") {
    // window values oscillate ±30 around 100: med=100, mad=30,
    // threshold 4.4478*30 = 133.4 — a +120 excursion must NOT flag
    val vals = Seq(70L, 130L, 100L, 220L, 70L, 130L, 100L, 70L, 130L, 100L, 70L)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (f"2024-02-${i + 1}%02d", v) }.toDF("d", "v")
      .select(to_date(col("d")).as("day"), col("v"))
      .withColumn("g", lit("s"))
    val out = Hampel.filter(df, "g", "day", "v").orderBy("day").collect()
    val r3 = out(3) // the 220 sits 120 above its window median of 100
    assert(r3.getAs[Long]("v") == 220L)
    assert(r3.getAs[Long]("med") == 100L)
    assert(r3.getAs[Long]("mad") == 30L)
    assert(!r3.getAs[Boolean]("is_outlier"),
      "120 < 4.4478 * 30 = 133.4 must stay quiet")
  }

  test("ccf: identical series peak exactly at lag 0, ~1e6 permicro") {
    val n = 21
    val p = new scala.util.Random(7).shuffle((1 to n).toList)
    val df = p.zipWithIndex.map { case (v, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 3, 1).plusDays(i)),
        1000L * v, 1000L * v) }.toDF("day", "x", "y")
    val out = CrossCorr.ccf(df, "day", "x", "y", h = 3).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Long]("ccf_permicro")).toMap
    assert(out(0) >= 1000000L && out(0) <= 1010000L,
      s"self-correlation at lag 0 must be ~1e6, got ${out(0)}")
    assert((-3 to 3).filter(_ != 0).forall(k => out(k) < out(0)))
  }

  test("ccf: a planted 2-day lead is recovered as the argmax lag") {
    val n = 41
    val p = new scala.util.Random(11).shuffle((1 to n).toList)
    // y_d = x_{d-2}: x LEADS y by 2 days
    val rows = (3 to n).map { d =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 4, 1).plusDays(d)),
        1000L * p(d - 1), 1000L * p(d - 3)) }
    val df = rows.toDF("day", "x", "y")
    val out = CrossCorr.ccf(df, "day", "x", "y", h = 5).collect()
      .map(r => r.getAs[Int]("lag") -> r.getAs[Long]("ccf_permicro")).toMap
    val best = out.maxBy(_._2)
    assert(best._1 == 2, s"expected lead 2, got ${best._1} (table $out)")
    assert(best._2 > 900000L)
  }

  test("gated instances: well-formed on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val h = Hampel.hampelEvents(spark, sf).collect()
    assert(h.length > 0)
    val c = CrossCorr.ccfEvents(spark, sf).collect()
    assert(c.length == 15)
    c.foreach { r =>
      val v = r.getAs[Long]("ccf_permicro")
      assert(math.abs(v) <= 1010000L)
    }
  }
}
