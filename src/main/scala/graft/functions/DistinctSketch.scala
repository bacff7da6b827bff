package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact-under-cap mergeable distinct sketch as a typed [[Aggregator]]:
  * per group, the buffer is the SORTED set of distinct 64-bit hashes,
  * capped at `cap` — below the cap the count is exact (the sparse/exact
  * phase every production distinct sketch runs before flipping dense:
  * HLL++'s sparse mode, Theta's sample mode); at the cap it reports the
  * overflow sentinel −1 instead of guessing, which is the handoff point
  * to the HLL path (`sketch_distinct_events`).
  *
  * Why this is the right 100 TB shape for the LOW-cardinality groups
  * profiling actually meets (enum-ish columns, per-type user counts):
  * map-side partial aggregation bounds each task's shuffle payload per
  * group at 2·(cap+1) longs — the amortized-compaction buffer may cross
  * the serialization boundary un-compacted, duplicates included, since
  * compaction triggers only at ≥ 2·(cap+1) entries — merge is a
  * bounded sorted-set union, and
  * the result is deterministic under ANY partitioning — which is what
  * lets the degeneracy gate (cap ≥ cardinality ⇒ result ≡ exact
  * COUNT(DISTINCT)) hash-match DuckDB. A plain `countDistinct` plans a
  * two-shuffle expand; this is one aggregate whose payload is bounded.
  *
  * Anchor: discover_schema.py's distinct-count profiling
  * (/root/reference/DataEngineering/DataBricks/discover_schema.py:70-111
  * classifies columns by distinct counts) — the mergeable form those
  * profiles need at fleet scale.
  */
class DistinctUnderCap(cap: Int)
  extends Aggregator[Long, Seq[Long], Long] {
  require(cap > 0, "positive cap")

  // Buffer discipline: O(1) LIST PREPEND per row, duplicates tolerated,
  // compacted (distinct+sort+truncate) only every ~2·cap insertions and
  // at merge/finish — amortized O(log cap) per row. The first cut did a
  // sorted-insert per row (O(set) copy + sort per element): correct, but
  // measured 172 s at the sf1 sweep on 15k-distinct groups; this form
  // is ~2 s. Overflow is monotone: once a compaction truncates to cap+1
  // DISTINCT survivors, every later compaction still sees ≥ cap+1.
  private val compactAt = 2 * (cap + 1)

  // Vector, not List: prepend is effectively O(1) on both, but the
  // per-row `length` guard is O(1) only on Vector (List.length walks
  // the list — O(n) per row, the same quadratic trap again)
  private[functions] def compact(b: Seq[Long]): Seq[Long] = {
    val d = b.distinct.sorted
    (if (d.length > cap) d.take(cap + 1) else d).toVector
  }

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], a: Long): Seq[Long] = {
    // a buffer crossing a serialization boundary may deserialize as a
    // non-Vector Seq (array-backed: O(n) prepend) — re-vectorize once,
    // after which the prepend chain stays Vector
    val base = b match { case v: Vector[Long] => v; case other => other.toVector }
    val nb = a +: base
    if (nb.length >= compactAt) compact(nb) else nb
  }

  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    compact(b1 ++ b2)

  /** Exact distinct count, or −1 once the cap is exceeded. */
  override def finish(r: Seq[Long]): Long = {
    val d = compact(r)
    if (d.length > cap) -1L else d.length.toLong
  }

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Long] =
    ExpressionEncoder[Long]()
}

/** Same bounded sorted-set buffer, but FINISHING with the set itself
  * (null once overflowed) — the form set OPERATIONS consume: audience
  * overlap, segment union/intersection counts. At 100 TB beyond the
  * cap these become Theta-sketch estimates; under it they are exact,
  * which is what the `audience_overlap` gate pins. */
class DistinctSetUnderCap(cap: Int)
  extends Aggregator[Long, Seq[Long], Seq[Long]] {
  private val inner = new DistinctUnderCap(cap)
  override def zero: Seq[Long] = inner.zero
  override def reduce(b: Seq[Long], a: Long): Seq[Long] = inner.reduce(b, a)
  override def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = inner.merge(b1, b2)
  override def finish(r: Seq[Long]): Seq[Long] = {
    val d = inner.compact(r) // the raw buffer may still carry duplicates
    if (d.length > cap) null else d
  }
  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object DistinctSketch {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions.{array_intersect, broadcast, col, count, lit, round, size, xxhash64}

  /** Column form: exact distinct count of `e`'s xxhash64 under `cap`,
    * −1 on overflow. (A 64-bit hash collision inside one group is the
    * usual ~n²/2⁶⁵ non-event.) */
  def distinctUnderCap(cap: Int)(e: Column): Column =
    udaf(new DistinctUnderCap(cap)).apply(xxhash64(e))

  // ---- query-map entry (degeneracy-gated, hash) ----

  /** Degeneracy gate: cap (100k) far above the per-type user
    * cardinality ⇒ the sketch NEVER overflows and its output is
    * bit-identical to exact COUNT(DISTINCT) — so the mergeable-sketch
    * machinery (bounded buffer, map-side partials, union merge,
    * overflow sentinel logic) all sits inside the DuckDB hash gate.
    * The HLL key stays the unbounded-cardinality path. */
  def sketchDistinctExact(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        distinctUnderCap(100000)(col("user_id")).as("n_distinct"),
        count(lit(1)).as("n_rows"))

  def oracleSql: String =
    """SELECT event_type,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct,
      |  CAST(count(*) AS BIGINT) AS n_rows
      |FROM events GROUP BY event_type""".stripMargin

  /** Column form of the set-valued sketch. */
  def distinctSetUnderCap(cap: Int)(e: Column): Column =
    udaf(new DistinctSetUnderCap(cap)).apply(xxhash64(e))

  /** Pairwise audience overlap over sketch SETS: per (segment a <
    * segment b), exact |A|, |B|, |A∩B|, |A∪B| and Jaccard — the
    * Theta-sketch set-operation workload (campaign/audience overlap),
    * exact under the cap. Shape at scale: the heavy side (events) is
    * touched ONCE by the sketch aggregate; the pair join runs at
    * segment-pair cardinality (segments², tiny) over broadcast
    * sketch rows, and the intersect cost is |A|+|B| per pair (sorted
    * arrays). Beyond the cap the same plan carries Theta sketches. */
  def audienceOverlap(df: DataFrame, segCol: String, idCol: String,
                      cap: Int): DataFrame = {
    // localCheckpoint: `sets` feeds BOTH sides of the pair join below;
    // without it the full-table sketch aggregate is planned (and run)
    // twice — same multi-consumer discipline as BowVectors/MinHashLsh.
    val sets = df.groupBy(col(segCol).as("__seg"))
      .agg(distinctSetUnderCap(cap)(col(idCol)).as("__s"))
      .localCheckpoint()
    val a = sets.select(col("__seg").as("type_a"), col("__s").as("__sa"))
    val b = sets.select(col("__seg").as("type_b"), col("__s").as("__sb"))
    val inter = size(array_intersect(col("__sa"), col("__sb"))).cast("long")
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        size(col("__sa")).cast("long").as("n_a"),
        size(col("__sb")).cast("long").as("n_b"),
        inter.as("n_overlap"),
        (size(col("__sa")) + size(col("__sb")) - inter).cast("long").as("n_union"),
        round(inter.cast("double") /
          (size(col("__sa")) + size(col("__sb")) - inter), 6).as("jaccard"))
  }

  // ---- query-map entry (hash-gated; exact under cap) ----

  def audienceOverlapEvents(spark: SparkSession, dir: String): DataFrame =
    audienceOverlap(graft.Tables.events(spark, dir), "event_type", "user_id",
      cap = 100000)

  def overlapOracleSql: String =
    """WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
      |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM u GROUP BY 1),
      |ov AS (
      |  SELECT x.event_type AS type_a, y.event_type AS type_b,
      |    CAST(count(*) AS BIGINT) AS n_overlap
      |  FROM u x JOIN u y
      |    ON x.user_id = y.user_id AND x.event_type < y.event_type
      |  GROUP BY 1, 2)
      |SELECT na.event_type AS type_a, nb.event_type AS type_b,
      |  na.n AS n_a, nb.n AS n_b,
      |  coalesce(o.n_overlap, 0) AS n_overlap,
      |  na.n + nb.n - coalesce(o.n_overlap, 0) AS n_union,
      |  round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE)
      |    / (na.n + nb.n - coalesce(o.n_overlap, 0)), 6) AS jaccard
      |FROM n na JOIN n nb ON na.event_type < nb.event_type
      |LEFT JOIN ov o
      |  ON o.type_a = na.event_type AND o.type_b = nb.event_type""".stripMargin
}
