package graft

import java.sql.Date
import org.apache.spark.sql.functions._

/** Bucketed interval-overlap join vs the naive cross-filter oracle. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("bucketed pairs == naive cross-filter pairs, at several bucket widths") {
    // deterministic pseudo-random intervals, lengths 0..90 days — many
    // span multiple buckets at W=7, some dozens
    val left = (1 to 40).map { i =>
      val st = java.time.LocalDate.of(2024, 1, 1).plusDays((i * 37) % 200)
      (i.toLong, Date.valueOf(st), Date.valueOf(st.plusDays((i * 13) % 91)))
    }.toDF("lid", "ls", "le")
    val right = (1 to 50).map { j =>
      val st = java.time.LocalDate.of(2024, 1, 1).plusDays((j * 23) % 210)
      (j.toLong, Date.valueOf(st), Date.valueOf(st.plusDays((j * 7) % 60)))
    }.toDF("rid", "rs", "re")
    val naive = left.crossJoin(right)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)
    for (w <- Seq(1, 7, 32, 365)) {
      val got = graft.operators.IntervalJoin
        .overlapPairs(left, right, "ls", "le", "rs", "re", bucketDays = w)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"W=$w must emit each pair ONCE")
      assert(got.toSet === naive, s"W=$w pair set must equal the naive join")
    }
  }

  test("equi keys restrict pairs to matching groups") {
    val left = Seq((1L, "a", d("2024-01-01"), d("2024-01-10")),
      (2L, "b", d("2024-01-01"), d("2024-01-10"))).toDF("lid", "lg", "ls", "le")
    val right = Seq((10L, "a", d("2024-01-05"), d("2024-01-06")),
      (20L, "b", d("2024-02-01"), d("2024-02-02"))).toDF("rid", "rg", "rs", "re")
    val got = graft.operators.IntervalJoin
      .overlapPairs(left, right, "ls", "le", "rs", "re",
        equiKeys = Seq("lg" -> "rg"), bucketDays = 7)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)), "only the same-group overlapping pair")
  }

  test("empty intervals (end < start) are dropped, touching endpoints match") {
    val left = Seq((1L, d("2024-01-10"), d("2024-01-01")),
      (2L, d("2024-01-10"), d("2024-01-10"))).toDF("lid", "ls", "le")
    val right = Seq((10L, d("2024-01-10"), d("2024-01-10"))).toDF("rid", "rs", "re")
    val got = graft.operators.IntervalJoin
      .overlapPairs(left, right, "ls", "le", "rs", "re", bucketDays = 3)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 10L)))
  }

  test("gated instance: overlap days within window capacity") {
    val out = graft.operators.IntervalJoin.maintenanceOverlap(spark, sfDir).collect()
    assert(out.nonEmpty)
    // every overlap contributes 1..14 days per pair
    assert(out.forall(r => r.getLong(2) >= r.getLong(1) &&
      r.getLong(2) <= 14L * r.getLong(1)))
  }
}
