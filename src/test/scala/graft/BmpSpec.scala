package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{BinaryMedia, BmpCodec}

/** The BMP codec against hand-computed bytes: a 2×2 planted image must
  * encode to the exact header + padded pixel layout and decode back
  * bit-for-bit — the "real decode" gate behind mm_decode_bmp. */
class BmpSpec extends SparkSpec {
  import spark.implicits._

  test("2x2 planted image: exact header bytes and padded BGR rows") {
    // pixels (x,y)->gray: (0,0)=10 (1,0)=20 / (0,1)=30 (1,1)=40
    val px = Map((0, 0) -> 10, (1, 0) -> 20, (0, 1) -> 30, (1, 1) -> 40)
    val b = BmpCodec.encodeGray(2, 2, (x, y) => px((x, y)))
    // file: 54 header + 2 rows x (6 pixel bytes + 2 pad) = 70
    assert(b.length == 70)
    assert(b(0) == 'B'.toByte && b(1) == 'M'.toByte)
    def le32(off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
    assert(le32(2) == 70)           // declared file size
    assert(le32(10) == 54)          // pixel offset
    assert(le32(14) == 40)          // info-header size
    assert(le32(18) == 2 && le32(22) == 2) // dims
    assert((b(28) & 0xFF) == 24)    // bpp
    // bottom-up: first stored row is y=1 → 30,30,30, 40,40,40, pad 0,0
    assert(b.slice(54, 62).toSeq == Seq[Byte](30, 30, 30, 40, 40, 40, 0, 0))
    // then y=0 → 10,10,10, 20,20,20, pad
    assert(b.slice(62, 70).toSeq == Seq[Byte](10, 10, 10, 20, 20, 20, 0, 0))
    val d = BmpCodec.decode(b)
    assert(d == BmpCodec.Decoded(2, 2, 4, 3L * (10 + 20 + 30 + 40)))
  }

  test("roundtrip across padding regimes (w mod 4 = 0..3)") {
    for (w <- 3 to 6; h <- Seq(1, 5)) {
      val b = BmpCodec.encodeGray(w, h, (x, y) => (x * 11 + y * 17) % 256)
      val d = BmpCodec.decode(b)
      assert(d.width == w && d.height == h && d.nPx == w.toLong * h)
      val expect = 3L * (for (x <- 0 until w; y <- 0 until h)
        yield ((x * 11 + y * 17) % 256).toLong).sum
      assert(d.sumRgb == expect, s"sum mismatch at ${w}x$h")
    }
  }

  test("isBmp rejects text payloads, truncations, and size lies") {
    assert(!BmpCodec.isBmp("BM is a stock ticker not a bitmap here".getBytes))
    val good = BmpCodec.encodeGray(4, 4, (_, _) => 128)
    assert(BmpCodec.isBmp(good))
    assert(!BmpCodec.isBmp(good.dropRight(1)))       // truncated
    val lied = good.clone(); lied(2) = (lied(2) + 1).toByte
    assert(!BmpCodec.isBmp(lied))                    // wrong declared size
  }

  test("decodeBatch routes BMP payloads through the real decoder") {
    val media = Seq((1L, BmpCodec.encodeGray(2, 1, (x, _) => 100 + x * 50)))
      .toDF("media_id", "payload")
    val luma = BinaryMedia.decodeBatch(media).head().getDouble(1)
    assert(luma == 125.0, s"mean gray of {100,150} must be 125, got $luma")
  }

  test("gated instance agrees with the closed-form generator") {
    val out = BinaryMedia.mmDecodeBmp(spark, sfDir)
    val bad = out.filter(
      col("width") =!= (col("media_id") % 24 + 8).cast("int") ||
      col("height") =!= (col("media_id") % 16 + 8).cast("int") ||
      col("n_px") =!= col("width").cast("long") * col("height")).count()
    assert(bad == 0)
    assert(out.count() > 0)
  }
}
