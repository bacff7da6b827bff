package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Multi-config bounded top-K DCG fold — graft's first NATIVE
  * [[TypedImperativeAggregate]] (the `ApproximatePercentile` layer of
  * the public API, one level below the `udaf(Aggregator)` wrapper
  * [[TopKAgg]] uses).
  *
  * Motivation (measured, tpe_pointwise r19): scoring T model configs
  * over an eval frame with a per-(config, user) top-K expands the frame
  * T× BEFORE aggregation — 160M rows at sf0.1 — and both the window
  * form and the typed-udaf form pay a per-expanded-row cost (the udaf
  * additionally round-trips every input row through an
  * ExpressionEncoder, and ObjectHashAggregateExec falls back to
  * sort-based aggregation past 128 groups per partition, re-creating
  * the window's sort — the Covisitation scaladoc's head-to-head).
  * When the per-row score is a function of a DIM-levelled attribute
  * (here: item-level margins, so each config's candidate order is one
  * global item permutation), the expansion is avoidable: attach to each
  * fact row the T per-config order keys as ONE array (a fact⋈dim join,
  * no row blowup) and fold all T bounded top-K buffers in a SINGLE pass
  * per group. This aggregate is that fold:
  *
  * input: (orderKeys array<bigint> of length nCfg — smaller = better,
  * unique within a group per config; gain bit 0/1). Buffer: nCfg
  * segments of the K smallest `orderKey·2 + gain` values seen, sorted
  * ascending, Long.MaxValue-padded — update is O(1) reject once a
  * segment saturates (the TopKAgg buffer discipline, flattened into one
  * primitive long array: no per-row allocation, no encoder). Output:
  * array<bigint> of length nCfg — per config Σ_{p≤K} gain_p · disc(p),
  * the truncated discounted cumulative gain.
  *
  * Shuffle volume is groups·nCfg·K longs (map-side partials), memory
  * per group is nCfg·K longs, merge order cannot matter (the per-config
  * packed order is total: order keys are unique within a group).
  */
case class MultiTopKDcg(
    orderKeys: Expression,
    gain: Expression,
    disc: Seq[Long],
    k: Int,
    nCfg: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  require(disc.length >= k, "need a discount per kept position")

  override def left: Expression = orderKeys
  override def right: Expression = gain
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultiTopKDcg =
    copy(orderKeys = newLeft, gain = newRight)
  override def withNewMutableAggBufferOffset(newOffset: Int): MultiTopKDcg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MultiTopKDcg =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_mtopk_dcg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(nCfg * k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val keysRaw = orderKeys.eval(input)
    val gainRaw = gain.eval(input)
    if (keysRaw != null && gainRaw != null) {
      val keys = keysRaw.asInstanceOf[ArrayData]
      val g = gainRaw.asInstanceOf[Long]
      var c = 0
      while (c < nCfg) {
        val v = keys.getLong(c) * 2 + g
        val base = c * k
        val last = base + k - 1
        if (v < buf(last)) { // O(1) reject on a saturated segment
          var i = last
          while (i > base && buf(i - 1) > v) { buf(i) = buf(i - 1); i -= 1 }
          buf(i) = v
        }
        c += 1
      }
    }
    buf
  }

  // One k-long scratch per deserialized instance (= per task): merge is
  // called once per partial-buffer row in the sort-based merge phase —
  // millions of calls per task at the 10x replica — and a fresh
  // nCfg*k array per call was the allocation site of the r19 heap OOM
  // (untracked-by-Spark young-gen churn on a heap already holding the
  // corpus checkpoint). In-place into b1 with a segment copy instead.
  @transient private lazy val mergeScratch = new Array[Long](k)

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    val tmp = mergeScratch
    var c = 0
    while (c < nCfg) {
      val base = c * k
      System.arraycopy(b1, base, tmp, 0, k)
      // ascending + MaxValue padding: the k smallest of the two sorted
      // segments never index past tmp(k-1) / b2(base+k-1)
      var i = 0; var j = base; var o = base
      while (o < base + k) {
        if (tmp(i) <= b2(j)) { b1(o) = tmp(i); i += 1 }
        else { b1(o) = b2(j); j += 1 }
        o += 1
      }
      c += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val dcg = new Array[Long](nCfg)
    var c = 0
    while (c < nCfg) {
      var s = 0L
      var p = 0
      while (p < k) {
        val v = buf(c * k + p)
        if (v != Long.MaxValue) s += (v & 1L) * disc(p)
        p += 1
      }
      dcg(c) = s
      c += 1
    }
    new GenericArrayData(dcg)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }
}

object MultiTopKDcg {
  /** Column form. `orderKeys` must be `array<bigint>` of length `nCfg`
    * (per-config order keys, smaller = better, unique within a group);
    * `gain` a 0/1 BIGINT. Returns `array<bigint>` of per-config DCG. */
  def multiTopKDcg(orderKeys: Column, gain: Column, disc: Seq[Long],
                   k: Int, nCfg: Int): Column =
    Native.call(
      s"graft_mtopk_dcg_${Native.contentHash(disc, Seq(k.toLong, nCfg.toLong))}",
      exprs => MultiTopKDcg(exprs(0), exprs(1), disc, k, nCfg),
      orderKeys, gain)
}
