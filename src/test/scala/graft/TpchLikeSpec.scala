package graft

import graft.queries.TpchLike
import org.apache.spark.sql.functions._

class TpchLikeSpec extends SparkSpec {

  test("q1 pricing summary aggregates per flag/status") {
    val rows = TpchLike.q1PricingSummary(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val r = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(r.size == rows.length, "group keys must be unique")
    rows.foreach { row =>
      assert(row.getLong(row.fieldIndex("count_order")) > 0)
      assert(row.getDouble(row.fieldIndex("sum_qty")) > 0)
    }
  }

  test("q3 returns at most 10 rows sorted by revenue desc") {
    val rows = TpchLike.q3ShippingPriority(spark, sfDir).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getDouble(3))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q5 groups revenue by nation within ASIA") {
    val rows = TpchLike.q5LocalSupplier(spark, sfDir).collect()
    assert(rows.forall(_.getDouble(1) >= 0))
  }

  test("window top customers: at most 3 per segment, ranks 1..3") {
    val df = TpchLike.topCustomersWindow(spark, sfDir)
    val perSeg = df.groupBy("c_mktsegment").count().collect()
    assert(perSeg.forall(_.getLong(1) <= 3))
    val ranks = df.select("seg_rank").distinct().collect().map(_.getInt(0)).toSet
    assert(ranks.subsetOf(Set(1, 2, 3)))
  }

  test("json extract parses props.k for every event type") {
    val rows = TpchLike.jsonExtract(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("sum_k")), "props.k must parse to non-null sums")
    }
  }

  test("skew-safe topk equals naive groupBy count") {
    val salted = TpchLike.skewTopk(spark, sfDir, 10).collect()
    val naive = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(10).collect()
    assert(salted.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
           naive.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
  }
}
