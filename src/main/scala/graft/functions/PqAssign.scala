package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Product-quantization code assignment: for a quantized vector and a
  * (subspace × code × subdim) codebook, emit each subspace's nearest
  * code id (L2, ties to the lower id).
  *
  * One compiled loop per row. The expression-tree formulation
  * (subspaces × codes of `array_min(array(struct(dot, k)))`) generates
  * hundreds of expressions per plan — Janino compilation alone took
  * seconds per k-means iteration, and every iteration's new literals
  * forced a recompile. Here the codebook rides along as a reference
  * object and the generated code is a one-line static call.
  */
case class PqAssign(child: Expression, books: Seq[Seq[Seq[Long]]])
  extends UnaryExpression {

  @transient private lazy val booksArr: Array[Array[Array[Long]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_assign"
  // codebooks stay out of plan text (case-class default rendered the
  // whole subspaces x codes x subdim table into every explain string)
  override def toString: String =
    s"$prettyName($child, books=<${books.length}x${books.head.length}>)"

  override protected def nullSafeEval(input: Any): Any =
    PqAssign.compute(input.asInstanceOf[ArrayData], booksArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqBooks", booksArr, "long[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqAssign.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqAssign {
  def compute(v: ArrayData, books: Array[Array[Array[Long]]]): ArrayData = {
    val s = books.length
    val subDim = v.numElements() / s
    val out = new Array[Int](s)
    var si = 0
    while (si < s) {
      val book = books(si)
      var best = 0
      var bestDist = Long.MaxValue
      var k = 0
      while (k < book.length) {
        val c = book(k)
        var dist = 0L
        var d = 0
        while (d < subDim) {
          val diff = v.getLong(si * subDim + d) - c(d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; best = k }
        k += 1
      }
      out(si) = best
      si += 1
    }
    new GenericArrayData(out)
  }
}
