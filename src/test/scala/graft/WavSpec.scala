package graft

import graft.multimodal.{BinaryMedia, WavCodec}

/** Byte-level contract of the pure-JVM WAV codec (the audio twin of
  * BmpSpec) plus the expression-level header parse dispatch. */
class WavSpec extends SparkSpec {
  import spark.implicits._

  test("planted 4-sample clip: exact header bytes and LE samples") {
    val samples = Array(0, 1, -1, -32768)
    val b = WavCodec.encodePcm16(8000, 4, samples(_))
    assert(b.length == 44 + 8)
    assert(new String(b.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(b.slice(8, 16), "US-ASCII") == "WAVEfmt ")
    assert(new String(b.slice(36, 40), "US-ASCII") == "data")
    // LE u32 fields: riffSize, fmtSize, rate, dataSize
    def le32(off: Int) = (0 until 4).map(i => (b(off + i) & 0xFF).toLong << (8 * i)).sum
    assert(le32(4) == 36 + 8 && le32(16) == 16 && le32(24) == 8000 && le32(40) == 8)
    // samples round-trip, including the negative edge
    val d = WavCodec.decode(b)
    assert(d == WavCodec.Decoded(8000, 4, 0, 0L + 1 - 1 - 32768, 32768))
  }

  test("duration is integer milliseconds of n/rate") {
    val b = WavCodec.encodePcm16(8000, 1001, _ => 0)
    assert(WavCodec.decode(b).durationMs == 1001L * 1000 / 8000) // 125 ms
  }

  test("isWav rejects text, truncations, size lies, and non-PCM16 layouts") {
    val good = WavCodec.encodePcm16(8000, 10, i => i)
    assert(WavCodec.isWav(good))
    assert(!WavCodec.isWav("RIFF but not really a wave file....".getBytes))
    assert(!WavCodec.isWav(good.dropRight(2))) // truncation breaks both sizes
    val lied = good.clone(); lied(40) = (lied(40) + 2).toByte // dataSize lie
    assert(!WavCodec.isWav(lied))
    val stereo = good.clone(); stereo(22) = 2 // channels != 1
    assert(!WavCodec.isWav(stereo))
  }

  test("withMeta reads WAV duration from the actual header bytes") {
    // 8000 samples at 8 kHz = exactly 1000 ms — nothing like the
    // n_bytes*8 stub (payload is 16044 bytes -> stub would say 128352)
    val wav = WavCodec.encodePcm16(8000, 8000, i => (i % 7) - 3)
    val rows = Seq((1L, "audio", wav),
      (2L, "audio", "definitely not audio".getBytes("UTF-8")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map {
        case (id, t, b) => org.apache.spark.sql.Row(id, t, b)
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("media_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType))))
    val m = BinaryMedia.withMeta(df)
      .select("media_id", "n_bytes", "duration_ms")
      .as[(Long, Int, Long)].collect().map(r => r._1 -> r).toMap
    assert(m(1L)._3 == 1000L, s"header duration wrong: ${m(1L)}")
    assert(m(2L)._3 == m(2L)._2.toLong * 8, "codec-less audio must keep the stub")
  }

  test("gated instance agrees with the closed-form generator") {
    val got = BinaryMedia.mmDecodeWav(spark, sfDir)
      .as[(Long, Int, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, rate, n, dur, sum, peak) =>
      val nn = id % 800 + 100
      assert(rate == 8000 && n == nn && dur == nn * 1000 / 8000)
      val samples = (0L until nn).map(i => ((id * 31 + i * 7) % 65536) - 32768)
      assert(sum == samples.sum && peak == samples.map(math.abs).max,
        s"decode stats off for id $id")
    }
  }
}
