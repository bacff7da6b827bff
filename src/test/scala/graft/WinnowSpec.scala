package graft

import graft.functions.WinnowSelect
import org.apache.spark.sql.catalyst.util.ArrayData

/** Contracts of MOSS winnowing selection: the coverage guarantee
  * (every w-window selects something), the rightmost-min tie rule,
  * density ~2/(w+1), and the short-document boundary. */
class WinnowSpec extends SparkSpec {

  private val M = 1000000007L

  private def select(text: String, k: Int, w: Int): Seq[(Long, Long)] =
    WinnowSelect.compute(text, k, w).asInstanceOf[ArrayData]
      .toLongArray().toSeq.map(e => (e / M, e % M))

  test("fewer than k tokens selects nothing; exactly k selects the one gram") {
    assert(select("a b", 3, 4).isEmpty)
    val one = select("a b c", 3, 4)
    assert(one.size == 1 && one.head._1 == 1L)
  }

  test("every window of w k-gram positions contains a selected position") {
    val words = (1 to 60).map(i => s"w${i * 7 % 13}")
    val text = words.mkString(" ")
    val sel = select(text, 3, 4).map(_._1).toSet
    val nk = words.size - 3 + 1
    (1 to (nk - 4 + 1)).foreach { j =>
      assert((j until j + 4).exists(p => sel.contains(p.toLong)),
        s"window starting at $j selected nothing")
    }
  }

  test("identical token runs select identical (relative-offset, hash) sets") {
    // shared run of length >= w+k-1 guarantees a shared fingerprint
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val a = s"xx yy $shared"
    val b = s"qq rr ss $shared"
    val ha = select(a, 3, 4).map(_._2).toSet
    val hb = select(b, 3, 4).map(_._2).toSet
    assert((ha intersect hb).nonEmpty,
      "documents sharing a long run must share a fingerprint")
  }

  test("all-equal hashes pick the rightmost position in each window") {
    // identical tokens -> identical k-gram hashes everywhere; the
    // rightmost-min rule then selects the LAST position of each window
    val text = List.fill(10)("same").mkString(" ")
    val nk = 10 - 3 + 1 // 8 k-gram positions
    val sel = select(text, 3, 4).map(_._1)
    assert(sel == (4L to nk.toLong))
  }

  test("selection density stays near 2/(w+1) on varied text") {
    val rnd = new scala.util.Random(7)
    val words = (1 to 2000).map(_ => "t" + rnd.nextInt(5000))
    val sel = select(words.mkString(" "), 3, 4)
    val nk = 2000 - 3 + 1
    val density = sel.size.toDouble / nk
    assert(density > 0.2 && density < 0.6, s"density $density out of band")
  }
}
