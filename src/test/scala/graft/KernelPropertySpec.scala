package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.functions.{MinHashSignature, Mix64, PolyFingerprint, PqAssign}
import graft.operators.ColumnNames

/** Property-style checks (seeded, deterministic) for the pure-JVM kernels
  * behind the native expressions — no SparkSession needed, so hundreds of
  * cases run in milliseconds. */
class KernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private val wsChars = " \t\n\f\r"

  private def randToken(): String =
    Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(26)).toChar).mkString
  private def randWs(): String =
    Seq.fill(1 + rnd.nextInt(3))(wsChars(rnd.nextInt(wsChars.length))).mkString
  private def randText(): String =
    Seq.fill(rnd.nextInt(12))(if (rnd.nextBoolean()) randToken() else randWs()).mkString

  /** Reference fingerprint straight from the documented definition:
    * split with Java regex limit -1, fold per-token char hashes. */
  private def refFingerprint(s: String): Long = {
    val M = PolyFingerprint.M
    s.split("\\s+", -1).foldLeft(0L) { (acc, w) =>
      val h = w.foldLeft(0L)((a, c) => (a * 131L + c.toLong) % M)
      (acc * 31L + h) % M
    }
  }

  test("PolyFingerprint.compute equals the split/fold definition on arbitrary ws layouts") {
    val cases = Seq("", " ", "  ", "a", " a", "a ", "a  b", "\t\n", "xy") ++
      Seq.fill(500)(randText())
    cases.foreach { s =>
      assert(PolyFingerprint.compute(s) == refFingerprint(s),
        s"mismatch on codepoints ${s.map(_.toInt).mkString(",")}")
    }
  }

  test("MinHashSignature: superset dominance and permutation invariance") {
    (1 to 200).foreach { _ =>
      val hs = Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong())
      val base = MinHashSignature.compute(new GenericArrayData(hs.toArray), 16)
      val more = MinHashSignature.compute(
        new GenericArrayData((rnd.nextLong() +: hs).toArray), 16)
      val shuffled = MinHashSignature.compute(
        new GenericArrayData(rnd.shuffle(hs).toArray), 16)
      (0 until 16).foreach { i =>
        assert(more.getLong(i) <= base.getLong(i), "adding an element raised a slot")
        assert(shuffled.getLong(i) == base.getLong(i), "order changed the signature")
      }
    }
  }

  test("PqAssign picks the true L2-nearest code with lowest-id tie-break") {
    val dim = 8; val sub = 2; val subDim = dim / sub
    (1 to 200).foreach { _ =>
      val books = Array.fill(sub)(
        Array.fill(4)(Array.fill(subDim)(rnd.nextLong() % 50)))
      val v = Seq.fill(dim)(rnd.nextLong() % 50)
      val out = PqAssign.compute(new GenericArrayData(v.toArray), books)
      (0 until sub).foreach { s =>
        val slice = v.slice(s * subDim, (s + 1) * subDim)
        def d2(c: Array[Long]) = slice.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
        val best = books(s).map(d2).zipWithIndex.minBy { case (d, i) => (d, i) }._2
        assert(out.getInt(s) == best)
      }
    }
  }

  test("toCamel is idempotent and strips separators") {
    val seps = "_-. "
    (1 to 300).foreach { _ =>
      val n = Seq.fill(1 + rnd.nextInt(12))(
        if (rnd.nextInt(4) == 0) seps(rnd.nextInt(seps.length))
        else ('a' + rnd.nextInt(26)).toChar).mkString
      val c = ColumnNames.toCamel(n)
      assert(ColumnNames.toCamel(c) == c, s"not idempotent on '$n' -> '$c'")
      assert(!c.exists(seps.contains(_)) || c == n, s"separator survived in '$c'")
    }
  }

  test("Mix64 has no collisions on a contiguous small domain") {
    val inputs = -5000L to 5000L
    assert(inputs.map(Mix64.mix).toSet.size == inputs.size)
  }

  test("zip pack/unzip roundtrips arbitrary member sets byte-for-byte") {
    import graft.multimodal.ArchiveIngest
    (1 to 200).foreach { _ =>
      val members = Seq.tabulate(rnd.nextInt(8)) { i =>
        val bytes = Array.fill(rnd.nextInt(2000))(rnd.nextInt.toByte)
        (s"m$i", bytes)
      }
      val back = ArchiveIngest.unzipArchive(ArchiveIngest.zipArchive(members))
      assert(back.map(_._1) == members.map(_._1), "member names/order")
      members.lazyZip(back).foreach { case ((_, bytes), (_, sz, _, got)) =>
        assert(sz == bytes.length.toLong && got.sameElements(bytes))
      }
    }
    // archives are byte-stable: same members, same bytes (epoch mtimes)
    val m = Seq("a" -> Array[Byte](1, 2, 3), "b" -> Array.fill(5000)(7: Byte))
    assert(ArchiveIngest.zipArchive(m).sameElements(ArchiveIngest.zipArchive(m)))
  }

  test("HashedBowEncoder buckets stay in range and signs are balanced-ish") {
    import graft.operators.EmbedDocs.HashedBowEncoder
    val toks = Seq.fill(2000)(randToken()).distinct
    val bs = toks.map(HashedBowEncoder.bucketAndSign)
    assert(bs.forall { case (i, s) =>
      i >= 0 && i < graft.operators.EmbedDocs.Dim && (s == 1.0 || s == -1.0) })
    val plus = bs.count(_._2 == 1.0).toDouble / bs.length
    assert(plus > 0.35 && plus < 0.65, s"sign bias $plus")
    // every bucket reachable over a modest vocabulary
    assert(bs.map(_._1).distinct.length == graft.operators.EmbedDocs.Dim)
  }
}
