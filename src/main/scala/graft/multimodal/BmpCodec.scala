package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM BMP (Windows bitmap) codec — a REAL image decoder behind
  * the [[BinaryMedia.decodeBatch]] seam, replacing the declared stub.
  * BMP is chosen deliberately: the container ships no image libraries,
  * and the uncompressed 24-bit BI_RGB form is fully specified by two
  * fixed headers + padded BGR rows, so an exact encoder/decoder pair is
  * implementable (and spec-checkable byte-for-byte) without any codec
  * dependency. The public format reference is the Windows
  * BITMAPFILEHEADER/BITMAPINFOHEADER layout: 14-byte file header
  * ('BM', file size, pixel-data offset), 40-byte info header (width,
  * height, planes=1, bpp, compression), then bottom-up rows of BGR
  * triples padded to 4-byte boundaries.
  *
  * The reference's multimodal surface stages binary blobs and decodes
  * them worker-side (async_scan_blob_zip_contents.py walks archives;
  * the vision pipelines feed decoded tensors) — this is that decode
  * step with a dependency-free format.
  */
object BmpCodec {

  private val HeaderSize = 54 // 14 (file) + 40 (info)

  /** Encode a grayscale image as 24-bit BI_RGB BMP: pixel (x, y) — y=0
    * is the TOP row — gets B=G=R=gray(x, y) & 0xFF. */
  def encodeGray(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0, "positive dimensions")
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * h
    val buf = ByteBuffer.allocate(HeaderSize + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(HeaderSize + dataSize)        // file size
      .putShort(0).putShort(0)              // reserved
      .putInt(HeaderSize)                   // pixel-data offset
    buf.putInt(40)                          // info-header size
      .putInt(w).putInt(h)                  // height > 0: bottom-up rows
      .putShort(1)                          // planes
      .putShort(24)                         // bits per pixel
      .putInt(0)                            // BI_RGB (uncompressed)
      .putInt(dataSize)
      .putInt(2835).putInt(2835)            // 72 DPI in px/metre
      .putInt(0).putInt(0)                  // palette sizes (none)
    var y = h - 1                           // rows stored bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val g = (gray(x, y) & 0xFF).toByte
        buf.put(g).put(g).put(g)            // B, G, R
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Strict structural check: magic, header sizes, declared file size
    * matching the byte count, 24 bpp, BI_RGB. A non-BMP payload that
    * happens to start with "BM" cannot pass the little-endian size
    * match. */
  def isBmp(bytes: Array[Byte]): Boolean =
    bytes.length >= HeaderSize && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte && {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      buf.getInt(2) == bytes.length && buf.getInt(10) == HeaderSize &&
        buf.getInt(14) == 40 && buf.getShort(28) == 24 && buf.getInt(30) == 0
    }

  final case class Decoded(width: Int, height: Int, nPx: Long, sumRgb: Long)

  /** Decode a 24-bit BI_RGB BMP: dimensions from the info header, exact
    * BIGINT sum of all channel bytes over the (padded, bottom-up) pixel
    * rows. Fails fast on anything structurally off rather than guessing. */
  def decode(bytes: Array[Byte]): Decoded = {
    require(isBmp(bytes), "not a 24-bit BI_RGB BMP payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    require(w > 0 && h > 0, s"unsupported dimensions ${w}x$h")
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    require(bytes.length == HeaderSize + (rowBytes + pad) * h,
      "pixel data length mismatch")
    var sum = 0L
    var y = 0
    while (y < h) {
      val rowStart = HeaderSize + y * (rowBytes + pad)
      var i = 0
      while (i < rowBytes) {
        sum += (bytes(rowStart + i) & 0xFF)
        i += 1
      }
      y += 1
    }
    Decoded(w, h, w.toLong * h, sum)
  }

  /** Decode to the row-major TOP-DOWN gray pixel array (encoder's
    * (x, y) indexing): rows un-reversed from the bottom-up storage,
    * gray read from the B channel (all three are equal for the gray
    * encoder; a color BMP would need a weighting policy — out of
    * scope, the strict structural check still applies). */
  def decodeGrayPixels(bytes: Array[Byte]): Array[Int] = {
    require(isBmp(bytes), "not a 24-bit BI_RGB BMP payload")
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val rowStart = HeaderSize + (h - 1 - y) * (rowBytes + pad)
      var x = 0
      while (x < w) {
        px(y * w + x) = bytes(rowStart + x * 3) & 0xFF
        x += 1
      }
      y += 1
    }
    px
  }
}
