package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TopKAgg

/** The bounded top-k aggregate must agree with the window-rank form. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("top-k aggregate equals window row_number form on real events") {
    val events = Tables.events(spark, sfDir)
      .select($"user_id", $"value".cast("double").as("value"), $"event_id")

    val agg = events
      .groupBy("user_id")
      .agg(TopKAgg.topK(3)($"value", $"event_id").as("top"))
      .select($"user_id", explode($"top").as("p"))
      .select($"user_id", $"p._1".as("value"), $"p._2".as("event_id"))
      .as[(Long, Double, Long)].collect().toSet

    val w = Window.partitionBy($"user_id").orderBy($"value".desc, $"event_id")
    val win = events.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"user_id", $"value", $"event_id")
      .as[(Long, Double, Long)].collect().toSet

    assert(agg == win)
  }

  test("top-k aggregate is partitioning-invariant") {
    val df = Seq((1L, 5.0, 10L), (1L, 5.0, 9L), (1L, 7.0, 1L), (1L, 1.0, 2L),
      (2L, 3.0, 3L)).toDF("g", "value", "id")
    def run(d: org.apache.spark.sql.DataFrame) = d.groupBy("g")
      .agg(TopKAgg.topK(2)($"value", $"id").as("top"))
      .select($"g", $"top").as[(Long, Seq[(Double, Long)])].collect().toMap
    val a = run(df)
    val b = run(df.repartition(5))
    assert(a == b)
    assert(a(1L) == Seq((7.0, 1L), (5.0, 9L))) // tie on 5.0 broken by smaller id
    assert(a(2L) == Seq((3.0, 3L)))
  }
}
