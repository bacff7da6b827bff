package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.Tables

/** Misra-Gries frequent-items ("heavy hitters") sketch — the third leg
  * of the sketch family next to HLL distinct and GK quantiles
  * ([[Sketches]]): a fixed-size mergeable summary that, with capacity
  * k, returns every item whose true frequency exceeds N/(k+1) and
  * estimates each surviving item's count within N/(k+1) of truth.
  * At 100 TB this replaces a full groupBy over an unbounded key
  * universe (top domains, hot templates, dominant near-dup clusters —
  * the "what dominates the corpus" question every curation pass asks)
  * with a k-entry map per partition merged map-side.
  *
  * Reference anchor: the corpus-composition counts the submix builders
  * key their rates on (/root/reference/MachineLearning/Data/
  * flan2022_submix/spark_data_generating.py task proportions;
  * generate_data.py:45-51 value_counts) — exact there, sketched here
  * for unbounded key domains.
  *
  * Merge rule (Agarwal et al., "Mergeable Summaries"): sum counters,
  * and if more than k survive, subtract the (k+1)-th largest counter
  * from all and drop the non-positive — preserving the N/(k+1) error
  * bound under arbitrary merge trees (asserted in SketchSpec).
  *
  * Degeneracy gate: with capacity ≥ the true distinct count no
  * eviction ever fires, every counter is exact, and the result equals
  * plain GROUP BY COUNT — the driver hash-gates the sketch machinery
  * through that identity (`freq_topk_exact`), the same trick that
  * gates the GK sketch (`sketch_quantiles_exact`).
  */
object FreqSketch {

  /** Misra-Gries aggregator over a string column, capacity k. */
  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long],
      Map[String, Long]] with Serializable {
    require(k >= 1, "capacity must be >= 1")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], v: String): Map[String, Long] =
      if (v == null) b
      else b.get(v) match {
        case Some(c) => b.updated(v, c + 1)
        case None if b.size < k => b.updated(v, 1L)
        case None => // decrement-all eviction
          b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }

    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val sum = (b1.keySet ++ b2.keySet).iterator
        .map(key => key -> (b1.getOrElse(key, 0L) + b2.getOrElse(key, 0L)))
        .toMap
      if (sum.size <= k) sum
      else {
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
        sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    }

    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
  }

  /** Heavy hitters of `valCol` as (item, est_count) rows, descending by
    * estimate then item (deterministic order for a deterministic
    * sketch state). */
  def heavyHitters(df: DataFrame, valCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mg = new MisraGries(k)
    val summary = df.select(col(valCol)).as[String].select(mg.toColumn)
    summary.flatMap(_.toSeq).toDF("item", "est_count")
  }

  // ---- query-map entry (hash-gated by exact-mode degeneracy) ----

  /** Capacity 64 ≥ the event-type cardinality ⇒ no eviction ⇒ counters
    * exact ⇒ identical to GROUP BY COUNT (the oracle). */
  def freqTopkExact(spark: SparkSession, dir: String): DataFrame =
    heavyHitters(Tables.events(spark, dir), "event_type", k = 64)

  def oracleSql: String =
    """SELECT event_type AS item, count(*) AS est_count
      |FROM events WHERE event_type IS NOT NULL
      |GROUP BY event_type""".stripMargin
}
