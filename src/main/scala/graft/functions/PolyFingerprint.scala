package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-sensitive rolling polynomial fingerprint of a text column —
  * token-level hash of per-token character hashes, mod 1e9+7.
  *
  * Semantically identical to the layered `aggregate(words, tokHash)`
  * expression in [[TextFunctions]], but those nested higher-order lambdas
  * evaluate interpreted with a per-character `substr`+`ascii` expression
  * call; this runs one compiled pass per row (the generated code calls
  * the companion's static forwarder). Tokenization matches Spark's
  * `split(text, "\\s+")`: limit −1, trailing empty tokens kept (an empty
  * token hashes to 0, as `ascii('')` does in the expression form).
  */
case class PolyFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    PolyFingerprint.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyFingerprint.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyFingerprint {
  final val M = 1000000007L

  /** Java-regex \s, exactly (Character.isWhitespace accepts more). */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** One-pass fingerprint: for each whitespace token w,
    * h(w) = fold(a, c → (a·131 + c) mod M) over its chars;
    * fp = fold(a, h → (a·31 + h) mod M) over tokens.
    * Chars are UTF-16 units — identical to the expression form for all
    * BMP text (the `ascii(substr)` form counts supplementary chars as
    * one codepoint; this counts the pair — ASCII corpora unaffected). */
  def compute(s: String): Long = {
    var fp = 0L
    var i = 0
    val n = s.length
    var tok = 0L
    def closeToken(): Unit = { fp = (fp * 31L + tok) % M; tok = 0L }
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) {
        // token boundary (a leading empty token hashes to 0, a no-op)
        closeToken()
        while (i + 1 < n && isWs(s.charAt(i + 1))) i += 1
      } else {
        tok = (tok * 131L + c.toLong) % M
      }
      i += 1
    }
    closeToken() // final token — empty after trailing ws, matching limit=-1 split
    fp
  }
}
