package graft

import graft.operators.WeightedMedian

class WeightedMedianSpec extends SparkSpec {
  import spark.implicits._

  private def median(rows: Seq[(String, Long, Long)]): Map[String, Long] =
    WeightedMedian.weightedMedian(rows.toDF("g", "v", "w"), "g", "v", "w")
      .select("grp", "median_v").as[(String, Long)].collect().toMap

  test("weighted median lands where cumulative weight crosses ceil(W/2)") {
    // W=6, cum at v=1 is 3 = ceil(6/2) -> lower weighted median is 1
    assert(median(Seq(("a", 1L, 3L), ("a", 2L, 1L), ("a", 3L, 2L)))
      === Map("a" -> 1L))
    // shift one unit of weight up: W=6, cum(1)=2 < 3, cum(2)=4 >= 3
    assert(median(Seq(("a", 1L, 2L), ("a", 2L, 2L), ("a", 3L, 2L)))
      === Map("a" -> 2L))
  }

  test("unit weights reduce to the unweighted lower median") {
    assert(median(Seq(("u", 10L, 1L), ("u", 20L, 1L), ("u", 30L, 1L),
      ("u", 40L, 1L))) === Map("u" -> 20L))
  }

  test("one dominant weight owns the median regardless of row count") {
    val rows = (1L to 9L).map(v => ("d", v, 1L)) :+ (("d", 5L, 100L))
    assert(median(rows) === Map("d" -> 5L))
  }

  test("groups are independent and exactly one row emits per group") {
    val out = WeightedMedian.weightedMedian(
      Seq(("x", 1L, 1L), ("x", 9L, 2L), ("y", 4L, 7L)).toDF("g", "v", "w"),
      "g", "v", "w").collect()
    assert(out.length == 2)
    assert(median(Seq(("x", 1L, 1L), ("x", 9L, 2L), ("y", 4L, 7L)))
      === Map("x" -> 9L, "y" -> 4L))
  }
}
