package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature of a hashed-shingle set: element i is
  * `min over h in input of mix64(h + GOLDEN·(i+1))` — `sigLen`
  * independent permutation approximations from one pass over the array.
  *
  * Replaces a `transform(sequence, i → aggregate(shingles, …xxhash64…))`
  * formulation whose nested interpreted lambdas re-hashed every shingle
  * string `sigLen` times; this is one compiled O(|set|·sigLen) loop over
  * longs per row. Empty input yields Long.MaxValue in every slot (no
  * shingles ⇒ collides with nothing).
  */
case class MinHashSignature(child: Expression, sigLen: Int) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprChecks.requireLongArray(child.dataType, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], sigLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSignature.compute($c, $sigLen)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  def compute(hashes: ArrayData, sigLen: Int): ArrayData = {
    val out = Array.fill(sigLen)(Long.MaxValue)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      val h = hashes.getLong(j)
      var i = 0
      while (i < sigLen) {
        val v = Mix64.mix(h + Mix64.Golden * (i + 1))
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}
