package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k collector as a typed [[Aggregator]]: per group, keep the
  * k largest (value, id) pairs, ties broken by smaller id.
  *
  * Why this beats `row_number().over(partitionBy(g).orderBy(v desc))` +
  * filter at scale: an aggregate gets map-side partial aggregation — each
  * task reduces its slice to ≤ k pairs BEFORE the shuffle, so shuffle
  * volume is O(groups·k) instead of the whole table, and no reducer ever
  * sorts a full group (the window form materializes and sorts every
  * group's rows on one partition). The buffer is bounded at k, so memory
  * is O(k) per group regardless of group size; merge order cannot change
  * the result because the (value desc, id asc) order is total.
  */
class TopKAgg(k: Int)
  extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }

  override def zero: Seq[(Double, Long)] = Seq.empty

  // buffer kept sorted (value desc, id asc): a full buffer rejects a
  // losing row in O(1) — the hot path once the head of a big group has
  // passed — and accepts by sorted insertion in O(k), never a resort
  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
    if (b.length >= k && ord.gteq(a, b.last)) b
    else {
      val (lo, hi) = b.span(ord.lt(_, a))
      val ins = (lo :+ a) ++ hi
      if (ins.length > k) ins.take(k) else ins
    }
  }

  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKAgg {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions.{col, explode}

  /** Column form: `topK(k)(value, id) -> array<struct<_1,_2>>` sorted
    * (value desc, id asc). */
  def topK(k: Int)(value: Column, id: Column): Column =
    udaf(new TopKAgg(k)).apply(value, id)

  // ---- query-map entry (extra beyond SURVEY §2) ----

  /** Top-3 events by value per user via the bounded aggregate, exploded
    * back to rows for the oracle (which uses the window-rank form). */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .select(col("user_id"), col("value").cast("double").as("value"), col("event_id"))
      .groupBy("user_id")
      .agg(topK(3)(col("value"), col("event_id")).as("__top"))
      .select(col("user_id"), explode(col("__top")).as("__p"))
      .select(col("user_id"), col("__p._1").as("value"), col("__p._2").as("event_id"))

  def oracleSql: String =
    """SELECT user_id, value, event_id FROM (
      |  SELECT user_id, CAST(value AS DOUBLE) AS value, event_id,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY CAST(value AS DOUBLE) DESC, event_id) AS rn
      |  FROM events) WHERE rn <= 3""".stripMargin
}
