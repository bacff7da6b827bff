package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{BinaryMedia, PngCodec}
import graft.sources.ZoneMap

class PngZoneSpec extends SparkSpec {
  import spark.implicits._

  test("png: byte-level round trip exercises all five filters") {
    // 6×7 touches filters 0..4 (rows 0..6 → filter y % 5) incl. repeats
    val px = (x: Int, y: Int) => (x * 11 + y * 29 + 3) % 256
    val bytes = PngCodec.encodeGray(6, 7, px)
    // real PNG signature
    assert((bytes(0) & 0xFF) === 0x89 && bytes(1) === 'P'.toByte)
    val d = PngCodec.decode(bytes)
    assert(d.width === 6 && d.height === 7 && d.nPx === 42L)
    val want = (for (y <- 0 until 7; x <- 0 until 6) yield px(x, y).toLong).sum
    assert(d.sumGray === want)
  }

  test("png: spoofed magic, bad CRC, and size lies are rejected loudly") {
    val ok = PngCodec.encodeGray(4, 4, (x, y) => x + y)
    val badMagic = ok.clone(); badMagic(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](PngCodec.decode(badMagic))
    val badCrc = ok.clone(); badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 0x7F).toByte
    assertThrows[IllegalArgumentException](PngCodec.decode(badCrc))
    assertThrows[IllegalArgumentException](PngCodec.decode(ok.take(20)))
  }

  test("png gated instance: decode matches the generator closed form") {
    val got = BinaryMedia.mmDecodePng(spark, sfDir)
      .select($"media_id", $"width", $"height", $"sum_gray")
      .as[(Long, Int, Int, Long)].collect()
    assert(got.nonEmpty)
    got.take(20).foreach { case (id, w, h, s) =>
      assert(w === (id % 24 + 8).toInt && h === (id % 16 + 8).toInt)
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(s === want, s"id $id")
    }
  }

  test("zonemap: skipped zones provably contain no matches") {
    val df = Seq(
      (1L, 10L), (1L, 20L), // zone 1: [10,20] — below range, skipped
      (2L, 45L), (2L, 55L), // zone 2: [45,55] — straddles lo, scanned
      (3L, 60L), (3L, 70L), // zone 3: inside, scanned
      (4L, 90L), (4L, 95L)  // zone 4: above range, skipped
    ).toDF("z", "v")
    val got = ZoneMap.pruneAudit(df, col("z"), col("v"), lo = 50L, hi = 80L)
    val rows = got.select($"zone", $"scanned", $"n_matched")
      .as[(Long, Boolean, Long)].collect().sortBy(_._1)
    assert(rows.map(r => (r._2, r._3)).toSeq ===
      Seq((false, 0L), (true, 1L), (true, 2L), (false, 0L)))
    val sum = got.select($"zones_scanned", $"rows_scanned", $"rows_matched")
      .as[(Long, Long, Long)].head()
    assert(sum === ((2L, 4L, 3L)))
  }

  test("zonemap gated instance: invariants hold at corpus scale") {
    val got = ZoneMap.zonemapLineitem(spark, sfDir)
    // a zone map may over-scan but NEVER skip a zone holding a match
    assert(got.filter($"n_matched" > 0 && !$"scanned").isEmpty)
    val s = got.select($"zones_total", $"zones_scanned", $"rows_total",
      $"rows_scanned").as[(Long, Long, Long, Long)].head()
    assert(s._2 < s._1, "pruning must actually skip zones here")
    assert(s._4 < s._3)
  }
}
