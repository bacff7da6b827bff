package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.call_function

/** Single entry point for invoking graft's native Catalyst expressions
  * through the public Column API: registers the builder on the active
  * session's function registry ONCE (idempotent — a re-register per
  * call spammed `SimpleFunctionRegistry ... replaced` warnings into
  * every bench/test log and re-resolved the builder needlessly), then
  * routes through `call_function`.
  *
  * Expressions whose constructor carries data (PQ codebooks, IVF
  * centroids) embed a content hash in `name`, so one session can hold
  * plans over different codebooks concurrently and each name always
  * resolves to its own builder.
  */
object Native {
  def call(name: String, builder: Seq[Expression] => Expression, args: Column*): Column = {
    val reg = SparkSession.active.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(name))) {
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    call_function(name, args: _*)
  }

  /** 160-bit content hash for name suffixes. The registry binds a name to
    * the FIRST builder registered under it, so two distinct codebooks whose
    * names collide would silently share one compiled expression; at the
    * 32-bit `hashCode` previously used here a same-session collision is a
    * birthday-bound risk (~50% at 77k registrations), at 160 bits it is
    * not. Walks nested Seqs of integral values — the shape every
    * codebook/centroid payload has. */
  def contentHash(parts: Any*): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val buf = java.nio.ByteBuffer.allocate(8)
    def putLong(l: Long): Unit = {
      buf.clear(); buf.putLong(l); md.update(buf.array(), 0, 8)
    }
    def walk(x: Any): Unit = x match {
      case s: Seq[_]  => md.update(0x5b.toByte); s.foreach(walk); md.update(0x5d.toByte)
      case a: Array[_] => md.update(0x5b.toByte); a.foreach(walk); md.update(0x5d.toByte)
      case l: Long    => putLong(l)
      case i: Int     => putLong(i.toLong)
      case other => throw new IllegalArgumentException(
        s"contentHash: unsupported payload ${other.getClass.getName}")
    }
    parts.foreach(walk)
    md.digest().map("%02x".format(_)).mkString
  }
}
