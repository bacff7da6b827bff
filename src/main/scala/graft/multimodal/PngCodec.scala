package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec (8-bit grayscale, non-interlaced) — the third
  * REAL codec beside [[BmpCodec]] and [[WavCodec]]: actual signature /
  * IHDR / IDAT / IEND chunk grammar with CRC32 per chunk, zlib
  * compression via `java.util.zip` (the deflate the format mandates),
  * and the full five-filter scanline algebra. The ENCODER deliberately
  * cycles the filter type per row (None, Sub, Up, Average, Paeth — the
  * spec's §9 heuristics simplified to a deterministic rotation), so a
  * decoder that shortcuts any un-filter path cannot round-trip the
  * planted images: the hash gate proves all five reconstructions.
  *
  * Compressed bytes are NOT part of any gated output (deflate output
  * is zlib-implementation-specific); every gated stat is a function of
  * the DECODED pixels, which the oracle predicts from the generator's
  * closed form without parsing a byte.
  *
  * Mirrors the reference's vision staging
  * (/root/reference/DataEngineering/Python/async_scan_blob_zip_contents.py
  * feeding image decode) with the decode made executable in-JVM.
  */
object PngCodec {
  private val Signature = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val crc = new CRC32
    val tb = tag.getBytes("US-ASCII")
    crc.update(tb); crc.update(data)
    be32(data.length.toLong) ++ tb ++ data ++ be32(crc.getValue)
  }

  /** Paeth predictor exactly as spec'd (left, above, upper-left). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode an 8-bit grayscale image; row r uses filter type r % 5. */
  def encodeGray(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val raw = new Array[Byte]((w + 1) * h)
    val cur = new Array[Int](w); val prev = new Array[Int](w)
    for (y <- 0 until h) {
      for (x <- 0 until w) cur(x) = gray(x, y) & 0xFF
      val f = y % 5
      raw(y * (w + 1)) = f.toByte
      for (x <- 0 until w) {
        val a = if (x > 0) cur(x - 1) else 0
        val b = if (y > 0) prev(x) else 0
        val c = if (x > 0 && y > 0) prev(x - 1) else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(y * (w + 1) + 1 + x) = ((cur(x) - pred) & 0xFF).toByte
      }
      Array.copy(cur, 0, prev, 0, w)
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, 0, 0, 0, 0) // depth 8, gray, deflate, adaptive, no interlace
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  final case class Decoded(width: Int, height: Int, nPx: Long, sumGray: Long)

  private def rd32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)

  /** Decode: chunk walk (CRC-checked), IDAT concat → inflate → the
    * five un-filters. Rejects non-PNG magic, non-gray-8 formats, and
    * size lies loudly — malformed media must fail, not fake stats. */
  def decode(bytes: Array[Byte]): Decoded = {
    require(bytes.length >= 8 && Signature.indices.forall(i => bytes(i) == Signature(i)),
      "not a PNG: bad signature")
    var off = 8
    var w = -1; var h = -1
    val idat = new ByteArrayOutputStream()
    var sawEnd = false
    while (off < bytes.length && !sawEnd) {
      require(off + 8 <= bytes.length, "truncated chunk header")
      val len = rd32(bytes, off)
      val tag = new String(bytes, off + 4, 4, "US-ASCII")
      require(off + 12 + len <= bytes.length, s"chunk $tag overruns payload")
      val crc = new CRC32
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue == (rd32(bytes, off + 8 + len).toLong & 0xFFFFFFFFL),
        s"chunk $tag CRC mismatch")
      tag match {
        case "IHDR" =>
          w = rd32(bytes, off + 8); h = rd32(bytes, off + 12)
          require(bytes(off + 16) == 8 && bytes(off + 17) == 0,
            "only 8-bit grayscale supported")
          require(bytes(off + 20) == 0, "interlace not supported")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len
    }
    require(w > 0 && h > 0, "missing IHDR")
    require(sawEnd, "missing IEND")
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val raw = new Array[Byte]((w + 1) * h)
    var got = 0
    // inflate() returning 0 (needs more input) on a truncated IDAT
    // must BREAK, not spin — the require below then reports the
    // truncation instead of the task hanging
    var made = 1
    while (got < raw.length && !inflater.finished() && made > 0) {
      made = inflater.inflate(raw, got, raw.length - got)
      got += made
    }
    inflater.end()
    require(got == raw.length, s"inflated $got bytes, expected ${raw.length}")
    var sum = 0L
    val cur = new Array[Int](w); val prev = new Array[Int](w)
    for (y <- 0 until h) {
      val f = raw(y * (w + 1)) & 0xFF
      require(f <= 4, s"unknown filter type $f")
      for (x <- 0 until w) {
        val v = raw(y * (w + 1) + 1 + x) & 0xFF
        val a = if (x > 0) cur(x - 1) else 0
        val b = if (y > 0) prev(x) else 0
        val c = if (x > 0 && y > 0) prev(x - 1) else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        cur(x) = (v + pred) & 0xFF
        sum += cur(x)
      }
      Array.copy(cur, 0, prev, 0, w)
    }
    Decoded(w, h, w.toLong * h, sum)
  }
}
