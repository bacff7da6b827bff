package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{BinaryMedia, GifCodec}
import graft.functions.ScriptAudit

class GifScriptSpec extends SparkSpec {
  import spark.implicits._

  test("gif: byte-level LZW round trip on a repetitive image") {
    // constant rows compress hard: dictionary growth + long matches
    val px = (x: Int, y: Int) => (y * 3) % 256
    val bytes = GifCodec.encodeGray(40, 30, px)
    assert(new String(bytes, 0, 6, "US-ASCII") === "GIF89a")
    val d = GifCodec.decode(bytes)
    assert(d.width === 40 && d.height === 30 && d.nPx === 1200L)
    val want = (for (y <- 0 until 30; x <- 0 until 40) yield px(x, y).toLong).sum
    assert(d.sumGray === want)
    // LZW actually compressed the repetitive rows
    assert(bytes.length < 13 + 768 + 1200)
  }

  test("gif: large noisy image exercises width growth and CLEAR resets") {
    val px = (x: Int, y: Int) => (x * 31 + y * 17 + (x * y) % 13) % 256
    val d = GifCodec.decode(GifCodec.encodeGray(200, 120, px))
    val want = (for (y <- 0 until 120; x <- 0 until 200) yield px(x, y).toLong).sum
    assert(d.nPx === 24000L && d.sumGray === want)
  }

  test("gif: non-GIF magic and truncated streams are rejected") {
    val ok = GifCodec.encodeGray(8, 8, (x, y) => x + y)
    val bad = ok.clone(); bad(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](GifCodec.decode(bad))
    assertThrows[Exception](GifCodec.decode(ok.take(40)))
  }

  test("gif: EOI width stays synced across a size sweep (stream-end bump)") {
    // the decoder defines a dict entry for the FINAL data code and may
    // widen before reading EOI; the encoder must mirror that bump or a
    // byte-aligned stream end throws on a valid image. Sweep many
    // shapes/patterns so dictionary fill lands at varied bit offsets,
    // including right at width-bump boundaries.
    for {
      w <- Seq(1, 2, 3, 5, 7, 13, 31, 64, 97)
      h <- Seq(1, 2, 9, 17)
      pat <- 0 to 2
    } {
      val px = (x: Int, y: Int) => pat match {
        case 0 => (x * 31 + y * 7) % 256 // high-entropy: fast dict growth
        case 1 => (x / 3) % 2 * 255      // runs: long matches
        case _ => (x + y) % 3            // tiny alphabet
      }
      val d = GifCodec.decode(GifCodec.encodeGray(w, h, px))
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield px(x, y).toLong).sum
      assert(d.sumGray === want, s"w=$w h=$h pat=$pat")
    }
  }

  test("gif gated instance: decode matches the generator closed form") {
    val got = BinaryMedia.mmDecodeGif(spark, sfDir)
      .select($"media_id", $"width", $"height", $"sum_gray")
      .as[(Long, Int, Int, Long)].collect()
    assert(got.nonEmpty)
    got.take(10).foreach { case (id, w, h, s) =>
      assert(w === (id % 24 + 8).toInt && h === (id % 16 + 8).toInt)
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(s === want, s"id $id")
    }
  }


  test("gif animation: every frame round-trips independently") {
    val px = (f: Int, x: Int, y: Int) => (f * 50 + x * 3 + y * 11) % 256
    val bytes = GifCodec.encodeAnimation(12, 9, frames = 4, px)
    val frames = GifCodec.decodeFrames(bytes)
    assert(frames.length === 4)
    frames.zipWithIndex.foreach { case (d, f) =>
      assert(d.width === 12 && d.height === 9)
      val want = (for (y <- 0 until 9; x <- 0 until 12)
        yield px(f, x, y).toLong).sum
      assert(d.sumGray === want, s"frame $f")
    }
    // single-frame decode still reads frame 0 of an animation
    assert(GifCodec.decode(bytes).sumGray === frames.head.sumGray)
  }

  test("gif video gated instance: frame counts follow the generator") {
    val got = BinaryMedia.mmVideoFrames(spark, sfDir)
      .groupBy($"media_id").agg(count(lit(1)).as("nf"))
      .as[(Long, Long)].collect()
    assert(got.nonEmpty)
    got.take(20).foreach { case (id, nf) => assert(nf === id % 5 + 2) }
  }

  test("script audit: hand spoof flagged, pure-Latin and pure-Cyrillic clean") {
    val docs = Seq(
      (1L, "hello wоrld plain"),   // wоrld carries Cyrillic о → mixed
      (2L, "all latin text"),
      (3L, "чисто русский текст")  // single-script: NOT a spoof
    ).toDF("doc_id", "text")
    val got = ScriptAudit.audit(docs, "doc_id", "text")
      .select($"doc_id", $"n_mixed", $"n_confusable_chars",
        $"n_docs_flagged").as[(Long, Long, Long, Long)].collect()
    assert(got.length === 1)
    assert(got.head === ((1L, 1L, 1L, 1L)))
  }

  test("script audit gated instance: exactly the planted set flagged") {
    val got = ScriptAuditResultFixture.flaggedIds(spark, sfDir)
    assert(got.nonEmpty)
    assert(got.forall(_ % 50 === 0))
  }
}

object ScriptAuditResultFixture {
  import org.apache.spark.sql.SparkSession
  def flaggedIds(spark: SparkSession, dir: String): Seq[Long] = {
    import spark.implicits._
    ScriptAudit.scriptAuditDocs(spark, dir)
      .select($"doc_id").as[Long].collect().toSeq
  }
}
