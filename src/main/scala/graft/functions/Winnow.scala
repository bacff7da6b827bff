package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003,
  * the MOSS local document fingerprinting algorithm) — the guaranteed-
  * coverage upgrade of [[PolyFingerprint]]'s single whole-document
  * hash: any shared token run of length ≥ w+k−1 between two documents
  * is GUARANTEED to share at least one selected fingerprint, while
  * only ~2/(w+1) of all k-gram hashes are kept.
  *
  * Pipeline per document (one compiled pass, no interpreted lambdas):
  * whitespace tokens → per-token char hash (h·131+c mod 1e9+7, the
  * [[PolyFingerprint]] token hash) → k-gram rolling hash
  * (a·31+h mod 1e9+7 over k consecutive token hashes) → for every
  * window of w consecutive k-gram positions select the RIGHTMOST
  * minimal hash (the paper's robust-winnowing tie rule) → distinct
  * selected positions.
  *
  * Output: array of `pos·(1e9+7) + hash` encoded longs (1-based k-gram
  * start position; hash < 1e9+7 so the encoding is injective and fits
  * a long to ~9·10⁹ tokens per document). Documents with fewer than
  * k tokens select nothing.
  */
case class WinnowSelect(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"winnow_select_${k}_$w"

  override protected def nullSafeEval(input: Any): Any =
    WinnowSelect.compute(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowSelect.compute($c.toString(), $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ALL k-gram rolling hashes of a document (the un-winnowed stream
  * [[WinnowSelect]] selects from) — the occurrence-level gram view for
  * corpus statistics like the cross-document duplicated-n-gram share.
  * Same token fold and k-gram chain as [[WinnowSelect]], so the two
  * expressions agree hash-for-hash. Documents with fewer than k tokens
  * emit an empty array. */
case class KGramHashes(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"kgram_hashes_$k"

  override protected def nullSafeEval(input: Any): Any =
    WinnowSelect.kgrams(input.asInstanceOf[UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowSelect.kgrams($c.toString(), $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowSelect {
  final val M = 1000000007L

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Token hashes under the [[PolyFingerprint]] char fold, split on
    * runs of whitespace with limit −1 semantics (leading/trailing
    * empty tokens hash to 0, matching `split(text, "\\s+")`). */
  private def tokenHashes(s: String): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var tok = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) {
        out += tok; tok = 0L
        while (i + 1 < n && isWs(s.charAt(i + 1))) i += 1
      } else tok = (tok * 131L + c.toLong) % M
      i += 1
    }
    out += tok
    out.toArray
  }

  /** All k-gram hashes in document order (1 per position), empty when
    * the document has fewer than k tokens. */
  def kgrams(s: String, k: Int): ArrayData = {
    val th = tokenHashes(s)
    val nk = th.length - k + 1
    if (nk <= 0) return new GenericArrayData(Array.empty[Long])
    val kg = new Array[Long](nk)
    var i = 0
    while (i < nk) {
      var a = 0L
      var j = 0
      while (j < k) { a = (a * 31L + th(i + j)) % M; j += 1 }
      kg(i) = a
      i += 1
    }
    new GenericArrayData(kg)
  }

  def compute(s: String, k: Int, w: Int): ArrayData = {
    val th = tokenHashes(s)
    val nk = th.length - k + 1
    if (nk <= 0) return new GenericArrayData(Array.empty[Long])
    // k-gram hashes, 1-based positions in the selection contract
    val kg = new Array[Long](nk)
    var i = 0
    while (i < nk) {
      var a = 0L
      var j = 0
      while (j < k) { a = (a * 31L + th(i + j)) % M; j += 1 }
      kg(i) = a
      i += 1
    }
    // windows of min(w, nk) positions; rightmost minimal hash each
    val ww = math.min(w, nk)
    val sel = new java.util.LinkedHashSet[Long]()
    var j0 = 0
    while (j0 + ww <= nk) {
      var best = j0
      var p = j0 + 1
      while (p < j0 + ww) { if (kg(p) <= kg(best)) best = p; p += 1 }
      sel.add((best + 1).toLong * M + kg(best))
      j0 += 1
    }
    val arr = new Array[Long](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { arr(o) = it.next(); o += 1 }
    new GenericArrayData(arr)
  }
}
