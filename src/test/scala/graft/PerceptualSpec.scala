package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{BmpCodec, Perceptual, WavCodec}

class PerceptualSpec extends SparkSpec {
  import spark.implicits._

  test("ahash: half-dark half-bright image splits the bit plane") {
    // left half 0, right half 255 on a 16×16 image
    val px = Array.tabulate(256)(i => if (i % 16 < 8) 0 else 255)
    val (hi, lo) = Perceptual.aHash(16, 16, px)
    // each block row: blocks 0..3 dark (bit 0), 4..7 bright (bit 1)
    val expectRow = 0xF0L // bits 4..7 set
    val expect32 = expectRow | (expectRow << 8) | (expectRow << 16) | (expectRow << 24)
    assert(lo === expect32 && hi === expect32)
  }

  test("ahash: identical pixels give identical hashes, decode roundtrip") {
    val g = (x: Int, y: Int) => (x * 7 + y * 13 + 5) % 256
    val bytes = BmpCodec.encodeGray(20, 12, g)
    val px = BmpCodec.decodeGrayPixels(bytes)
    assert(px.length === 240)
    // top-down (x, y) indexing must match the encoder's
    assert(px(0) === g(0, 0) && px(5 * 20 + 3) === g(3, 5))
    val direct = Array.tabulate(240)(i => g(i % 20, i / 20))
    assert(Perceptual.aHash(20, 12, px) === Perceptual.aHash(20, 12, direct))
  }

  test("image phash gated instance: clusters of 20 identical images") {
    val got = Perceptual.imagePhashClusters(spark, sfDir)
      .select($"n_images", $"min_id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    // every cluster is a full id-div-20 block (the planted structure)
    assert(got.forall(_._1 % 20 === 0))
    assert(got.forall(_._2 % 20 === 0))
  }

  test("audio fingerprint: rising staircase sets every delta bit") {
    // 300 samples: window energies strictly increase
    val bytes = WavCodec.encodePcm16(8000, 300, i => (i / 100 + 1) * 100)
    val s = WavCodec.decodeSamples(bytes)
    assert(s.length === 300 && s(250) === 300)
    // reproduce the operator's math locally
    val e = Array.tabulate(3)(w => (w * 100 until (w + 1) * 100)
      .map(i => math.abs(s(i).toLong)).sum)
    assert(e(0) < e(1) && e(1) < e(2))
  }

  test("audio fingerprint gated instance: windows follow the generator") {
    val got = Perceptual.audioFingerprint(spark, sfDir)
      .select($"media_id", $"n_windows", $"fp_bits")
      .as[(Long, Int, Long)].collect()
    assert(got.nonEmpty)
    got.take(20).foreach { case (id, nw, fp) =>
      assert(nw === ((id % 800 + 100) / 100).toInt)
      assert(fp >= 0 && fp < (1L << math.max(nw - 1, 0)))
    }
  }
}
