package graft.multimodal

import java.io.ByteArrayOutputStream
import scala.collection.mutable

/** Pure-JVM GIF89a codec (8-bit grayscale palette, single frame) with
  * REAL LZW — the fourth codec beside [[BmpCodec]]/[[WavCodec]]/
  * [[PngCodec]], adding the dictionary-compression family PNG's
  * deflate delegates to `java.util.zip`: here the LZW dictionary,
  * variable code widths (9→12 bits), LSB-first bit packing, CLEAR
  * dictionary resets, and the EOI terminator are all implemented and
  * decoded byte-level in this file. The encoder emits genuine
  * compressed streams (dictionary hits shrink repetitive rows), so the
  * decoder's dictionary-growth path — including the w+w[0] corner case
  * (a code referencing the entry being defined) — is exercised by real
  * data and pinned by the spec.
  *
  * Gated stats are functions of DECODED pixels only (the oracle
  * predicts them closed-form, never parsing a byte) — the
  * mm_decode_bmp/wav/png discipline.
  */
object GifCodec {

  private def lsd(w: Int, h: Int): Array[Byte] = Array[Byte](
    (w & 0xFF).toByte, ((w >> 8) & 0xFF).toByte,
    (h & 0xFF).toByte, ((h >> 8) & 0xFF).toByte,
    0xF7.toByte, // global color table, 256 entries, 8-bit color
    0, 0)

  /** Encode 8-bit grayscale pixels (row-major via `gray`) as GIF89a
    * with a 256-gray global palette and real LZW image data. */
  def encodeGray(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(lsd(w, h))
    for (i <- 0 until 256) { out.write(i); out.write(i); out.write(i) }
    out.write(0x2C) // image descriptor
    out.write(Array[Byte](0, 0, 0, 0,
      (w & 0xFF).toByte, ((w >> 8) & 0xFF).toByte,
      (h & 0xFF).toByte, ((h >> 8) & 0xFF).toByte, 0))
    out.write(8) // LZW minimum code size
    out.write(lzwCompress(
      Array.tabulate(w * h)(i => gray(i % w, i / w) & 0xFF), 8))
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** GIF-LZW compression: dictionary of pixel strings, CLEAR at
    * dictionary overflow, LSB-first variable-width codes, 255-byte
    * sub-block framing. */
  private def lzwCompress(pixels: Array[Int], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val bits = new BitWriter
    var dict = mutable.HashMap.empty[List[Int], Int]
    var next = 0
    var width = 0
    var addsSinceReset = 0
    def reset(): Unit = {
      dict = mutable.HashMap.empty
      for (i <- 0 until clear) dict(List(i)) = i
      next = eoi + 1
      width = minCodeSize + 1
      addsSinceReset = 0
    }
    reset()
    bits.write(clear, width)
    var cur = List.empty[Int]
    pixels.foreach { p =>
      val cand = p :: cur // reversed-prefix representation
      if (dict.contains(cand)) cur = cand
      else {
        bits.write(dict(cur), width)
        dict(cand) = next
        next += 1
        addsSinceReset += 1
        if (next == (1 << width) + 1) {
          // GIF increments width when next exceeds the current range
          if (width < 12) width += 1
          else { bits.write(clear, width); reset() }
        }
        cur = List(p)
      }
    }
    if (cur.nonEmpty) {
      bits.write(dict(cur), width)
      // mirror the decoder's post-code accounting: unless this is the
      // first code since a reset (decoder prev==null ⇒ no entry), the
      // decoder defines one more dict entry after reading it and
      // widens when the dict fills — EOI must be written at THAT
      // width, or a byte-aligned stream ends with EOI read wide and
      // the decode throws on a valid image.
      if (addsSinceReset > 0) {
        next += 1
        if (next == (1 << width) + 1 && width < 12) width += 1
      }
    }
    bits.write(eoi, width)
    blockify(bits.toBytes)
  }

  private def blockify(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n); off += n
    }
    out.write(0)
    out.toByteArray
  }

  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var acc = 0L; private var nbits = 0
    def write(code: Int, width: Int): Unit = {
      acc |= code.toLong << nbits; nbits += width
      while (nbits >= 8) { out.write((acc & 0xFF).toInt); acc >>>= 8; nbits -= 8 }
    }
    def toBytes: Array[Byte] = {
      if (nbits > 0) out.write((acc & 0xFF).toInt)
      out.toByteArray
    }
  }

  final case class Decoded(width: Int, height: Int, nPx: Long, sumGray: Long)

  /** Decode: header walk (LSD, palette, extensions skipped), LZW
    * inflate with full dictionary growth incl. the w+w[0] case,
    * grayscale readout via the palette. Malformed inputs fail loudly. */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length > 13 &&
      new String(bytes, 0, 6, "US-ASCII").startsWith("GIF8"), "not a GIF")
    val w = (bytes(6) & 0xFF) | ((bytes(7) & 0xFF) << 8)
    val h = (bytes(8) & 0xFF) | ((bytes(9) & 0xFF) << 8)
    val flags = bytes(10) & 0xFF
    var off = 13
    val palette = new Array[Int](256)
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      for (i <- 0 until n)
        palette(i) = bytes(off + 3 * i) & 0xFF // gray = red channel
      off += 3 * n
    }
    // walk blocks to the first image descriptor
    while (bytes(off) != 0x2C) {
      require(bytes(off) == 0x21, s"unexpected block 0x${(bytes(off) & 0xFF).toHexString}")
      off += 2 // extension introducer + label
      while (bytes(off) != 0) off += (bytes(off) & 0xFF) + 1
      off += 1
    }
    off += 1 + 8
    require((bytes(off) & 0x80) == 0, "local color tables not supported")
    off += 1
    val minCodeSize = bytes(off) & 0xFF; off += 1
    val data = new ByteArrayOutputStream()
    while (bytes(off) != 0) {
      val n = bytes(off) & 0xFF
      data.write(bytes, off + 1, n); off += n + 1
    }
    val pixels = lzwDecompress(data.toByteArray, minCodeSize, w * h)
    require(pixels.length == w * h,
      s"decoded ${pixels.length} pixels, expected ${w * h}")
    var sum = 0L
    pixels.foreach(p => sum += palette(p))
    Decoded(w, h, w.toLong * h, sum)
  }

  private def lzwDecompress(data: Array[Byte], minCodeSize: Int,
                            expected: Int): Array[Int] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = mutable.ArrayBuilder.make[Int]
    out.sizeHint(expected)
    var dict = mutable.ArrayBuffer.empty[Array[Int]]
    var width = 0
    def reset(): Unit = {
      dict = mutable.ArrayBuffer.tabulate(clear)(i => Array(i))
      dict += Array.emptyIntArray; dict += Array.emptyIntArray // clear, eoi
      width = minCodeSize + 1
    }
    reset()
    var acc = 0L; var nbits = 0; var pos = 0
    var prev: Array[Int] = null
    var done = false
    while (!done) {
      while (nbits < width && pos < data.length) {
        acc |= (data(pos) & 0xFFL) << nbits; nbits += 8; pos += 1
      }
      require(nbits >= width, "LZW stream truncated before EOI")
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; nbits -= width
      if (code == clear) { reset(); prev = null }
      else if (code == eoi) done = true
      else {
        val entry =
          if (code < dict.length) dict(code)
          else {
            require(code == dict.length && prev != null,
              s"LZW code $code out of range")
            prev :+ prev(0) // the w+w[0] self-referential case
          }
        out ++= entry
        if (prev != null) {
          dict += (prev :+ entry(0))
          if (dict.length == (1 << width) && width < 12) width += 1
        }
        prev = entry
      }
    }
    out.result()
  }

  /** Encode an ANIMATED grayscale GIF: each frame a full-size image
    * block with a minimal graphic-control extension, genuine LZW per
    * frame — the real multi-frame container that upgrades the
    * library's video story from opaque stand-in bytes to decodable
    * media. */
  def encodeAnimation(w: Int, h: Int, frames: Int,
                      gray: (Int, Int, Int) => Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(lsd(w, h))
    for (i <- 0 until 256) { out.write(i); out.write(i); out.write(i) }
    for (f <- 0 until frames) {
      // graphic control extension: 4-byte block, 4/100s delay, no transparency
      out.write(Array[Byte](0x21, 0xF9.toByte, 4, 0, 4, 0, 0, 0))
      out.write(0x2C)
      out.write(Array[Byte](0, 0, 0, 0,
        (w & 0xFF).toByte, ((w >> 8) & 0xFF).toByte,
        (h & 0xFF).toByte, ((h >> 8) & 0xFF).toByte, 0))
      out.write(8)
      out.write(lzwCompress(
        Array.tabulate(w * h)(i => gray(f, i % w, i / w) & 0xFF), 8))
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** Decode every frame of a (possibly animated) GIF — the frame-walk
    * generalization of [[decode]]; extensions are skipped, each image
    * block LZW-inflates independently. */
  def decodeFrames(bytes: Array[Byte]): Seq[Decoded] = {
    require(bytes.length > 13 &&
      new String(bytes, 0, 6, "US-ASCII").startsWith("GIF8"), "not a GIF")
    val flags = bytes(10) & 0xFF
    var off = 13
    val palette = new Array[Int](256)
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      for (i <- 0 until n) palette(i) = bytes(off + 3 * i) & 0xFF
      off += 3 * n
    }
    val frames = Seq.newBuilder[Decoded]
    while (bytes(off) != 0x3B) {
      bytes(off) match {
        case 0x21 => // extension: skip sub-blocks
          off += 2
          while (bytes(off) != 0) off += (bytes(off) & 0xFF) + 1
          off += 1
        case 0x2C =>
          val fw = (bytes(off + 5) & 0xFF) | ((bytes(off + 6) & 0xFF) << 8)
          val fh = (bytes(off + 7) & 0xFF) | ((bytes(off + 8) & 0xFF) << 8)
          require((bytes(off + 9) & 0x80) == 0, "local color tables not supported")
          off += 10
          val minCodeSize = bytes(off) & 0xFF; off += 1
          val data = new ByteArrayOutputStream()
          while (bytes(off) != 0) {
            val n = bytes(off) & 0xFF
            data.write(bytes, off + 1, n); off += n + 1
          }
          off += 1
          val px = lzwDecompress(data.toByteArray, minCodeSize, fw * fh)
          require(px.length == fw * fh,
            s"frame decoded ${px.length} pixels, expected ${fw * fh}")
          var sum = 0L
          px.foreach(p => sum += palette(p))
          frames += Decoded(fw, fh, fw.toLong * fh, sum)
        case other => throw new IllegalArgumentException(
          s"unexpected block 0x${(other & 0xFF).toHexString}")
      }
    }
    frames.result()
  }
}
