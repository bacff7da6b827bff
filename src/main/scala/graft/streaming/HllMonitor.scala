package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.Hll

/** Streaming distinct-cardinality monitor: the dense-phase HLL of
  * [[graft.functions.Hll]] kept ACROSS micro-batches per monitored key
  * via flatMapGroupsWithState — "how many distinct users has this
  * event type seen so far?" over the reference's live feed
  * (/root/reference/DataEngineering/DataBricks/spark_stream.py), the
  * streaming counterpart of discover_schema.py's cardinality
  * profiling.
  *
  * State is the 64-register array — O(64) longs per key FOREVER,
  * regardless of stream volume or distinct count. Unlike
  * [[CusumMonitor]]'s ordered folds, the register merge is
  * element-wise MAX: commutative, associative, idempotent — replayed
  * or reordered micro-batches land on the identical state with no
  * sorting discipline needed at all (the mergeability the batch twin's
  * union-merge spec proves, exercised across batch boundaries).
  * The hash pipeline and every readout table are the SAME Scala
  * constants the batch operator and its DuckDB oracle share, so the
  * streaming estimate agrees exactly with a batch [[Hll.sketch]] over
  * the union of everything ingested.
  */
object HllMonitor {

  case class Obs(key: String, id: Long)
  case class Regs(regs: Seq[Long], n_batches: Long)
  case class Estimate(key: String, n_batches: Long, n_zero: Long,
                      est_micro: Long, registers: Seq[Long])

  /** The batch-side hash → (bucket, rank), bit-identical to
    * [[Hll.sketch]]'s column pipeline (BigInt carries the 122-bit
    * products the SQL side does in DECIMAL/HUGEINT). */
  def bucketRank(id: Long): (Int, Long) = {
    val p = BigInt(Hll.P)
    val h1 = ((BigInt(Hll.A) * id + Hll.B) mod p).toLong
    val m1 = h1 ^ (h1 >> 30)
    val h2 = ((BigInt(Hll.A2) * m1) mod p).toLong
    val h = h2 ^ (h2 >> 27)
    val w = h / Hll.M
    val rank = if (w == 0L) Hll.MaxRank else java.lang.Long.numberOfTrailingZeros(w) + 1L
    ((h % Hll.M).toInt, rank)
  }

  /** Estimate readout from a register array — same integer tables as
    * the batch twin (no libm). */
  def estimate(regs: IndexedSeq[Long]): (Long, Long) = {
    val inv = Hll.InvPowNanos.toMap
    val sumInv = regs.map(inv).sum
    val nZero = regs.count(_ == 0L)
    val raw = Hll.AlphaMicro * (Hll.M.toLong * Hll.M) * 1000000000L / sumInv
    val est =
      if (nZero > 0 && raw <= 5L * Hll.M / 2 * 1000000L)
        Hll.LinearCountMicro.toMap.getOrElse(nZero.toLong, 0L)
      else raw
    (nZero.toLong, est)
  }

  def updateRegs(key: String, obs: Iterator[Obs],
                 state: GroupState[Regs]): Iterator[Estimate] = {
    val prior = state.getOption.getOrElse(Regs(Seq.fill(Hll.M)(0L), 0L))
    val regs = prior.regs.toArray
    obs.foreach { o =>
      val (b, r) = bucketRank(o.id)
      if (r > regs(b)) regs(b) = r
    }
    val batches = prior.n_batches + 1L
    state.update(Regs(regs.toSeq, batches))
    val (nZero, est) = estimate(regs.toIndexedSeq)
    Iterator(Estimate(key, batches, nZero, est, regs.toSeq))
  }

  /** Wire the monitor onto a keyed id stream. No timeout: cardinality
    * state is cumulative by definition. */
  def estimates(obs: Dataset[Obs]): Dataset[Estimate] = {
    implicit val ee = Encoders.product[Estimate]
    implicit val re = Encoders.product[Regs]
    implicit val ke = Encoders.STRING
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(updateRegs)
  }
}
