package graft

import org.apache.spark.sql.functions._
import graft.multimodal.BinaryMedia

/** Specs for the multimodal binary-column plumbing (#38–39). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = BinaryMedia.mediaFromDocs(
    Tables.documents(spark, sfDir), "doc_id", "text")

  test("payload is real binary and metadata is typed per media kind") {
    val m = BinaryMedia.withMeta(media)
    assert(m.schema("payload").dataType.typeName == "binary")
    val byType = m.groupBy("media_type")
      .agg(count(lit(1)).as("n"),
        count(col("width")).as("w"),
        count(col("duration_ms")).as("d"),
        count(col("frame_count")).as("f"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val (ni, wi, di, fi) = byType("image")
    assert(wi == ni && di == 0 && fi == 0, "image meta shape wrong")
    val (na, wa, da, fa) = byType("audio")
    assert(wa == 0 && da == na && fa == 0, "audio meta shape wrong")
    val (nv, wv, dv, fv) = byType("video")
    assert(wv == 0 && dv == nv && fv == nv, "video meta shape wrong")
  }

  test("withMeta reads BMP dimensions from the actual header bytes") {
    // Planted payloads: a real 100×50 BMP must yield header dims (100,
    // 50) — NOT the arithmetic-stub dims its byte length would predict —
    // while a codec-less text payload still falls back to the stub.
    val bmp = graft.multimodal.BmpCodec.encodeGray(100, 50, (x, y) => (x + y) % 256)
    val rows = Seq(
      (1L, "image", bmp),
      (2L, "image", "not a bitmap at all".getBytes("UTF-8")))
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
      .select("media_id", "n_bytes", "width", "height")
      .as[(Long, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    val (_, nb, w, h) = m(1L)
    assert((w, h) == ((100, 50)), s"header parse wrong: ${(w, h)}")
    assert((nb % 512 + 64, nb % 384 + 64) != ((100, 50)),
      "planted BMP accidentally matches the stub formula — test is vacuous")
    val (_, nb2, w2, h2) = m(2L)
    assert((w2, h2) == ((nb2 % 512 + 64, nb2 % 384 + 64)),
      "codec-less payload must fall back to the stub formula")

    // gated instance: every image row's dims match the generator closed
    // form — the header round-trip over the whole documents table
    val bad = BinaryMedia.mmMeta(spark, sfDir)
      .filter($"media_type" === "image" &&
        ($"width" =!= ($"media_id" % 24 + 8) ||
         $"height" =!= ($"media_id" % 16 + 8)))
      .count()
    assert(bad == 0, s"$bad image rows with header dims off the closed form")
  }

  test("frame sampling: only videos, every k-th frame, correct offsets") {
    val fs = BinaryMedia.frameSample(BinaryMedia.withMeta(media), every = 10)
      .as[(Long, Int, Long)].collect()
    assert(fs.nonEmpty)
    assert(fs.forall(_._1 % 3 == 2), "non-video media sampled")
    assert(fs.forall(r => r._2 % 10 == 0), "frame_idx not on the stride")
    assert(fs.forall(r => r._3 == r._2 * 100L), "byte offset mismatch")
    // each video contributes ceil(frame_count/10) frames
    val counts = fs.groupBy(_._1).view.mapValues(_.length).toMap
    val expected = BinaryMedia.withMeta(media).filter($"media_type" === "video")
      .select($"media_id", ceil($"frame_count" / 10.0).cast("int"))
      .as[(Long, Int)].collect().toMap
    assert(counts == expected)
  }

  test("resize plan: images only, aspect preserved, never upscales") {
    val r = BinaryMedia.resizePlan(BinaryMedia.withMeta(media), 224, 224)
      .as[(Long, Int, Int, Int, Int, Long)].collect()
    assert(r.nonEmpty)
    assert(r.forall(_._1 % 3 == 0), "non-image media in resize plan")
    r.foreach { case (_, w, h, ow, oh, ob) =>
      assert(ow <= 224 && oh <= 224)
      assert(ow <= w && oh <= h, "upscaled")
      // same scale factor on both axes (aspect preserved up to floor)
      val s = math.min(math.min(224.0 / w, 224.0 / h), 1.0)
      assert(ow == math.floor(w * s).toInt && oh == math.floor(h * s).toInt)
      assert(ob == ow.toLong * oh * 3)
    }
  }

  test("batched stub decode is deterministic and partition-independent") {
    val d1 = BinaryMedia.decodeBatch(media).as[(Long, Double)].collect().toMap
    val d2 = BinaryMedia.decodeBatch(media.repartition(9), batchSize = 7)
      .as[(Long, Double)].collect().toMap
    assert(d1 == d2)
    assert(d1.values.forall(l => l > 0 && l < 256))
  }

  test("zip pack/expand roundtrips arbitrary binary payloads with verified CRCs") {
    import graft.multimodal.ArchiveIngest
    // non-UTF8, empty, and >deflate-block payloads — all must survive
    val payloads: Map[Long, Array[Byte]] = Map(
      1L -> Array[Byte](0, -1, -128, 127, 10, 13),
      2L -> Array.emptyByteArray,
      3L -> Array.tabulate(70000)(i => (i * 31 % 251).toByte),
      52L -> Array[Byte](42))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(payloads.toSeq.map {
        case (id, b) => org.apache.spark.sql.Row(id, b)
      }, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType))))

    val packed = ArchiveIngest.pack(df, "id", "payload", groupSize = 50)
    // ids 1,2,3 share archive 0; id 52 lands in archive 1
    assert(packed.count() == 2)
    val members = ArchiveIngest.expand(packed, "archive_id", "archive")
      .collect().map { r =>
        r.getAs[String]("member_name") ->
          (r.getAs[Long]("archive_id"), r.getAs[Long]("member_size"),
            r.getAs[Long]("member_crc"), r.getAs[Array[Byte]]("member_bytes"))
      }.toMap
    assert(members.keySet == Set("1", "2", "3", "52"))
    payloads.foreach { case (id, bytes) =>
      val (aid, sz, crc, got) = members(id.toString)
      assert(aid == id / 50)
      assert(sz == bytes.length.toLong && got.sameElements(bytes), s"payload $id mangled")
      val expectCrc = new java.util.zip.CRC32()
      expectCrc.update(bytes)
      assert(crc == expectCrc.getValue, s"crc mismatch for $id")
    }

    // packing is partitioning-independent (members sorted within archive)
    val packedAgain = ArchiveIngest.pack(df.repartition(7), "id", "payload", 50)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val first = packed.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(packedAgain == first)

    // archive_id stays in long arithmetic: negative ids truncate toward
    // zero exactly like DuckDB's integer `//` (-101 // 50 = -2, not the
    // -3 a floor would give, nor the drift a double detour gives past 2^53)
    val neg = Seq((-101L, Array[Byte](1)), (-1L, Array[Byte](2)),
      (49L, Array[Byte](3)), (((1L << 60) + 7L), Array[Byte](4)))
    val negDf = spark.createDataFrame(
      spark.sparkContext.parallelize(neg.map {
        case (id, b) => org.apache.spark.sql.Row(id, b)
      }, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType))))
    val negIds = ArchiveIngest.pack(negDf, "id", "payload", 50)
      .select("archive_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(negIds == Seq(-2L, 0L, ((1L << 60) + 7L) / 50L).sorted,
      s"archive ids diverged from integer truncating division: $negIds")

    // a corrupted member fails loudly (zip CRC check), never truncates silently
    val archive0 = packed.filter($"archive_id" === 0L).head().getAs[Array[Byte]]("archive")
    val corrupt = archive0.clone()
    corrupt(archive0.length / 2) = (corrupt(archive0.length / 2) ^ 0x55).toByte
    intercept[Exception] { ArchiveIngest.unzipArchive(corrupt) }
  }
}
