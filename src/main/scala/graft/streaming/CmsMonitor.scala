package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.{CountMin, Hll}

/** Streaming heavy-hitter monitor: the Count-Min sketch of
  * [[graft.functions.CountMin]] kept ACROSS micro-batches per
  * monitored key via flatMapGroupsWithState — "which items are hot,
  * and roughly how hot, in this event stream so far?" over the
  * reference's live feed
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py). The
  * cardinality twin is [[HllMonitor]]; this is FREQUENCY.
  *
  * State is the D·W counter matrix plus a bounded candidate list of
  * current heavy hitters — O(D·W + H) longs per key FOREVER. Counter
  * merge is element-wise ADD: commutative and associative, so
  * reordered micro-batches land on identical counters (idempotence is
  * NOT free for CMS — replays double-count, which is why the sink-side
  * exactly-once discipline of [[VersionedTableSink]] matters upstream;
  * declared). The hash rows are the SAME mixer chain and stride the
  * batch operator gates against DuckDB, so a streaming state equals a
  * batch [[CountMin.registers]] over the union of everything ingested.
  *
  * Heavy-hitter candidates: any item whose CMS estimate at ingest time
  * clears `thresholdN` enters the candidate set; the per-batch readout
  * re-estimates every candidate against the CURRENT counters and
  * reports those still above threshold. One-sided semantics inherit
  * from CMS: no true heavy item is ever missed (estimates only
  * overcount); a borderline item may appear spuriously.
  */
object CmsMonitor {

  case class Obs(key: String, item: Long)
  case class CmsState(counters: Seq[Long], candidates: Seq[Long],
                      n_batches: Long, n_obs: Long)
  case class HeavyHitters(key: String, n_batches: Long, n_obs: Long,
                          items: Seq[Long], estimates: Seq[Long])

  /** Column index of item k in hash row j — the batch pipeline's
    * mixer chain on k·D + j (BigInt carries the 122-bit product the
    * SQL side does in HUGEINT). */
  def colOf(item: Long, j: Int): Int = {
    val p = BigInt(Hll.P)
    val x = item * CountMin.D + j
    val h1 = ((BigInt(Hll.A) * x + Hll.B) mod p).toLong
    val m1 = h1 ^ (h1 >> 30)
    val h2 = ((BigInt(Hll.A2) * m1) mod p).toLong
    val h = h2 ^ (h2 >> 27)
    (h % CountMin.W).toInt
  }

  /** CMS point estimate of `item` against flat counters (row-major
    * D×W). */
  def estimate(counters: IndexedSeq[Long], item: Long): Long =
    (0 until CountMin.D).map(j => counters(j * CountMin.W + colOf(item, j))).min

  /** Max tracked candidates per key (collision-survival bound; items
    * evicted smallest-estimate-first, item id breaking ties). */
  val MaxCandidates = 64

  def update(thresholdN: Long)(key: String, obs: Iterator[Obs],
             state: GroupState[CmsState]): Iterator[HeavyHitters] = {
    val prior = state.getOption.getOrElse(
      CmsState(Seq.fill(CountMin.D * CountMin.W)(0L), Seq.empty, 0L, 0L))
    val counters = prior.counters.toArray
    val cand = scala.collection.mutable.SortedSet.from(prior.candidates)
    var n = prior.n_obs
    obs.foreach { o =>
      var j = 0
      while (j < CountMin.D) {
        counters(j * CountMin.W + colOf(o.item, j)) += 1
        j += 1
      }
      n += 1
      if (estimate(counters.toIndexedSeq, o.item) >= thresholdN)
        cand += o.item
    }
    // re-estimate candidates against current counters; keep the bounded
    // top set (estimate DESC, item ASC) and report those above threshold
    val scored = cand.toSeq
      .map(i => (i, estimate(counters.toIndexedSeq, i)))
      .sortBy { case (i, e) => (-e, i) }
    val kept = scored.take(MaxCandidates)
    val hot = kept.filter(_._2 >= thresholdN)
    val batches = prior.n_batches + 1L
    state.update(CmsState(counters.toSeq, kept.map(_._1), batches, n))
    Iterator(HeavyHitters(key, batches, n, hot.map(_._1), hot.map(_._2)))
  }

  /** Wire the monitor onto a keyed item stream. No timeout: frequency
    * state is cumulative by definition. */
  def heavyHitters(obs: Dataset[Obs], thresholdN: Long): Dataset[HeavyHitters] = {
    implicit val he = Encoders.product[HeavyHitters]
    implicit val se = Encoders.product[CmsState]
    implicit val ke = Encoders.STRING
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update(thresholdN))
  }
}
