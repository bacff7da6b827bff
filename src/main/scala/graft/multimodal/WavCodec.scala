package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM WAV (RIFF PCM) codec — the audio sibling of [[BmpCodec]]:
  * a REAL decoder for the multimodal seam, implementable exactly
  * because canonical 16-bit PCM WAV is fully specified by a fixed
  * 44-byte header (RIFF chunk + "fmt " subchunk + "data" header) and
  * raw little-endian samples. The reference's pipelines stage audio
  * blobs the same way they stage images
  * (async_scan_blob_zip_contents.py walks the archives); this is the
  * dependency-free decode step for them.
  *
  * Layout (all little-endian): "RIFF", u32 riffSize = 36 + dataSize,
  * "WAVE"; "fmt ", u32 16, u16 audioFormat = 1 (PCM), u16 channels,
  * u32 sampleRate, u32 byteRate, u16 blockAlign, u16 bitsPerSample =
  * 16; "data", u32 dataSize; then dataSize/2 signed 16-bit samples.
  */
object WavCodec {

  private val HeaderSize = 44

  /** Encode mono 16-bit PCM: sample i = pcm(i), truncated to its low
    * 16 bits (callers pass values already in short range; the gated
    * generator does by construction). */
  def encodePcm16(sampleRate: Int, n: Int, pcm: Int => Int): Array[Byte] = {
    require(sampleRate > 0 && n > 0, "positive rate and sample count")
    val dataSize = n * 2
    val buf = ByteBuffer.allocate(HeaderSize + dataSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
      .putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
      .putInt(16)                 // PCM fmt-chunk size
      .putShort(1)                // audioFormat = PCM
      .putShort(1)                // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)     // byteRate = rate · block
      .putShort(2)                // blockAlign (1 ch · 16 bit)
      .putShort(16)               // bitsPerSample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < n) {
      buf.putShort((pcm(i) & 0xFFFF).toShort)
      i += 1
    }
    buf.array()
  }

  /** Strict structural check: magics, PCM16 mono, and BOTH declared
    * sizes matching the byte count — a spoofed "RIFF" prefix cannot
    * pass the little-endian size equations. */
  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= HeaderSize && {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def ascii(off: Int, s: String) =
        s.getBytes("US-ASCII").zipWithIndex.forall { case (b, i) => bytes(off + i) == b }
      ascii(0, "RIFF") && ascii(8, "WAVE") && ascii(12, "fmt ") &&
        ascii(36, "data") &&
        buf.getInt(16) == 16 && buf.getShort(20) == 1 &&
        buf.getShort(22) == 1 && buf.getShort(34) == 16 &&
        buf.getInt(4) == bytes.length - 8 &&
        buf.getInt(40) == bytes.length - HeaderSize &&
        (bytes.length - HeaderSize) % 2 == 0 &&
        bytes.length > HeaderSize
    }

  final case class Decoded(sampleRate: Int, nSamples: Long,
                           durationMs: Long, sumPcm: Long, peakAbs: Long)

  /** Decode canonical PCM16: rate and sample count from the header,
    * exact BIGINT sum and peak |amplitude| over the samples. */
  def decode(bytes: Array[Byte]): Decoded = {
    require(isWav(bytes), "not a canonical mono PCM16 WAV payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val rate = buf.getInt(24)
    require(rate > 0, "non-positive sample rate")
    val n = (bytes.length - HeaderSize) / 2
    var sum = 0L
    var peak = 0L
    var i = 0
    while (i < n) {
      val s = buf.getShort(HeaderSize + i * 2).toLong
      sum += s
      val a = math.abs(s)
      if (a > peak) peak = a
      i += 1
    }
    Decoded(rate, n.toLong, n.toLong * 1000L / rate, sum, peak)
  }

  /** Decode to the raw PCM16 sample array (encoder's index order). */
  def decodeSamples(bytes: Array[Byte]): Array[Short] = {
    require(isWav(bytes), "not a canonical mono PCM16 WAV payload")
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = (bytes.length - HeaderSize) / 2
    Array.tabulate(n)(i => buf.getShort(HeaderSize + i * 2))
  }
}
