package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal binary-column handling: opaque `binary` payloads + typed
  * metadata + deterministic frame sampling.
  *
  * Decode status: BMP, WAV, PNG, and GIF are REAL pure-JVM codecs
  * (BmpCodec.scala and friends — byte-level header/pixel/sample parses,
  * each hash-gated by its mm_decode_* key). ONLY VIDEO DECODE IS
  * STUBBED — the container ships no video codec, so the video "header
  * parse" is arithmetic over payload bytes (clearly fake, but fully
  * deterministic and cross-engine checkable); the batched
  * [[decodeBatch]] path mirrors how a real decoder plugs in and routes
  * structurally-validated image/audio payloads through the real codecs.
  * Everything Spark-side is real: the binary column type, the typed
  * metadata schema, the codegen'd per-row metadata expressions, and the
  * explode-based frame sampler whose output is one row per sampled frame
  * with its byte offset — the shape a video training-data pipeline
  * shuffles and joins.
  *
  * Scale shape: metadata extraction and frame explosion are map-side
  * expressions (no shuffle, no UDF); the explode multiplies rows by
  * sampled-frame count only (bounded by `every`), and payloads are NOT
  * duplicated per frame — sampled frames carry (id, index, offset), the
  * downstream fetch rejoins the payload by id only for frames it keeps.
  */
object BinaryMedia {

  /** Deterministic media table derived from documents: payload = UTF-8
    * bytes of text, type cycles image/audio/video by id. */
  def mediaFromDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("media_type"),
      col(textCol).cast("binary").as("payload"))

  /** Little-endian unsigned int read from a binary column at 0-based
    * byte offset `off`, as pure codegen'd expressions: slice the bytes,
    * hex them, swap to big-endian pair order, `conv` base-16. No UDF —
    * header parsing stays inside whole-stage codegen. */
  private def leU32(b: Column, off: Int): Column = {
    val h = hex(substring(b, off + 1, 4))
    conv(concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2)), 16, 10).cast("int")
  }

  private def leU16(b: Column, off: Int): Column = {
    val h = hex(substring(b, off + 1, 2))
    conv(concat(substring(h, 3, 2), substring(h, 1, 2)), 16, 10).cast("int")
  }

  /** Expression form of [[BmpCodec.isBmp]]'s structural check: magic,
    * declared file size matching the byte count, fixed header sizes,
    * 24 bpp, BI_RGB. Mirrors the JVM-side check bit-for-bit so the
    * dispatch below agrees with [[decodeBatch]]'s codec routing. */
  def isBmpExpr(b: Column): Column =
    (length(b) >= 54) &&
      (substring(b, 1, 2) === lit("BM".getBytes("US-ASCII"))) &&
      (leU32(b, 2) === length(b)) &&
      (leU32(b, 10) === 54) && (leU32(b, 14) === 40) &&
      (leU16(b, 28) === 24) && (leU32(b, 30) === 0)

  /** Expression form of [[WavCodec.isWav]]: RIFF/WAVE/fmt/data magics,
    * canonical mono PCM16 layout, both declared sizes matching the
    * byte count. */
  def isWavExpr(b: Column): Column =
    (length(b) > 44) &&
      (substring(b, 1, 4) === lit("RIFF".getBytes("US-ASCII"))) &&
      (substring(b, 9, 8) === lit("WAVEfmt ".getBytes("US-ASCII"))) &&
      (substring(b, 37, 4) === lit("data".getBytes("US-ASCII"))) &&
      (leU32(b, 16) === 16) && (leU16(b, 20) === 1) &&
      (leU16(b, 22) === 1) && (leU16(b, 34) === 16) &&
      (leU32(b, 4) === length(b) - 8) &&
      (leU32(b, 40) === length(b) - 44) &&
      ((length(b) - 44) % 2 === 0)

  /** Header decode, as expressions. Payloads in a format we ship a codec
    * for (BMP) get their dimensions READ FROM THE HEADER BYTES — a real
    * parse, codegen'd, no UDF. Formats with no codec in the container
    * fall back to the declared arithmetic stub (clearly fake, but
    * deterministic and cross-engine checkable); a real deployment
    * replaces that branch with a batched parse (see [[decodeBatch]]);
    * the *schema* is the contract. */
  def withMeta(media: DataFrame): DataFrame = {
    val n = length(col("payload"))
    val bmp = isBmpExpr(col("payload"))
    media
      .withColumn("n_bytes", n)
      .withColumn("width",
        when(col("media_type") === "image",
          when(bmp, leU32(col("payload"), 18)).otherwise(n % 512 + 64))
          .otherwise(lit(null).cast("int")))
      .withColumn("height",
        when(col("media_type") === "image",
          when(bmp, leU32(col("payload"), 22)).otherwise(n % 384 + 64))
          .otherwise(lit(null).cast("int")))
      // audio with a real WAV payload: duration from the header
      // (samples = (bytes − 44)/2, over the declared sample rate);
      // codec-less payloads keep the declared stub
      .withColumn("__wav", isWavExpr(col("payload")))
      .withColumn("__rate", leU32(col("payload"), 24).cast("long"))
      .withColumn("duration_ms",
        when(col("media_type") =!= "image",
          when(col("__wav"), expr(
            "((CAST(n_bytes AS BIGINT) - 44) div 2 * 1000) div __rate"))
            .otherwise(n.cast("long") * 8L))
          .otherwise(lit(null).cast("long")))
      .drop("__wav", "__rate")
      .withColumn("frame_count",
        when(col("media_type") === "video", (floor(n / 100) + 1).cast("int"))
          .otherwise(lit(null).cast("int")))
  }

  /** Every `every`-th frame of each video row: (media_id, frame_idx,
    * byte_offset). Payloads stay behind — only ids and offsets explode. */
  def frameSample(meta: DataFrame, every: Int): DataFrame =
    meta.filter(col("media_type") === "video")
      .select(col("media_id"), col("frame_count"),
        explode(sequence(lit(0), col("frame_count") - 1, lit(every))).as("frame_idx"))
      .withColumn("byte_offset", col("frame_idx").cast("long") * 100L)
      .select("media_id", "frame_idx", "byte_offset")

  /** STUB resize planning for image rows: target box, preserved aspect
    * ratio (scale to fit, never upscale), and output byte budget — the
    * metadata layer of a resize stage; the pixel work itself would run in
    * [[decodeBatch]]'s batched seam. Pure expressions: at 100 TB this is
    * a map-side projection planning the expensive decode, letting a
    * pipeline budget/filter BEFORE touching payload bytes. */
  def resizePlan(meta: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val scale = least(
      lit(targetW).cast("double") / col("width"),
      lit(targetH).cast("double") / col("height"),
      lit(1.0))
    meta.filter(col("media_type") === "image")
      .withColumn("out_w", floor(col("width") * scale).cast("int"))
      .withColumn("out_h", floor(col("height") * scale).cast("int"))
      .withColumn("out_bytes", (col("out_w").cast("long") * col("out_h") * 3L))
      .select("media_id", "width", "height", "out_w", "out_h", "out_bytes")
  }

  /** Batched decode — the mapPartitions seam where codecs plug in. BMP
    * payloads (structurally validated, see [[BmpCodec.isBmp]]) go
    * through the REAL pure-JVM decoder: avg_luma is the exact mean
    * channel byte over decoded pixel rows (header and padding excluded).
    * Foreign formats fall back to the payload byte mean — the container
    * ships no other codecs, and the fallback keeps the seam total. */
  def decodeBatch(media: DataFrame, batchSize: Int = 32): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("avg_luma", DoubleType)))
    val rows = media.select("media_id", "payload").rdd.mapPartitions { it =>
      // per-partition decoder init goes here (BmpCodec is stateless)
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          val luma =
            if (BmpCodec.isBmp(bytes)) {
              val d = BmpCodec.decode(bytes)
              d.sumRgb.toDouble / (3.0 * d.nPx)
            } else if (bytes.isEmpty) 0.0
            else bytes.map(b => (b & 0xFF).toDouble).sum / bytes.length
          Row(r.getLong(0), luma)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Deterministic REAL-BMP media table: each doc becomes a w×h
    * grayscale bitmap (dimensions and pixels closed-form in doc_id, so
    * the decode gate has a SQL oracle that never parses bytes — the
    * encoder writes a real header, the decoder must read it back). */
  def bmpMediaFromDocs(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val rows = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (id % 24 + 8).toInt
        val h = (id % 16 + 8).toInt
        Row(id, BmpCodec.encodeGray(w, h,
          (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt))
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Mixed-type media table with REAL payloads where a codec exists:
    * image rows (id % 3 == 0) carry an actual encoded BMP (dimensions
    * and pixels closed-form in the id, identical to
    * [[bmpMediaFromDocs]]); audio rows (id % 3 == 1) an actual mono
    * PCM16 WAV ([[wavMediaFromDocs]]'s closed form); video rows keep
    * the document's UTF-8 bytes as the opaque stand-in (no video codec
    * ships in the container — declared). [[withMeta]] must then read
    * image dimensions and audio duration from the header bytes — the
    * oracle predicts them from the generators' closed forms without
    * ever parsing a byte. */
  def typedMediaFromDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media_type", StringType, nullable = false),
      StructField("payload", BinaryType)))
    val rows = docs.select(col(idCol).cast("long"), col(textCol)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val mt = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val payload: Array[Byte] = mt match {
          case "image" =>
            val w = (id % 24 + 8).toInt
            val h = (id % 16 + 8).toInt
            BmpCodec.encodeGray(w, h,
              (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
          case "audio" =>
            WavCodec.encodePcm16(8000, (id % 800 + 100).toInt,
              i => (((id * 31 + i * 7) % 65536) - 32768).toInt)
          case _ => r.getString(1).getBytes("UTF-8")
        }
        Row(id, mt, payload)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Deterministic REAL-WAV media table: each doc becomes an 8 kHz mono
    * PCM16 clip with sample count and samples closed-form in the id —
    * the audio twin of [[bmpMediaFromDocs]]. */
  def wavMediaFromDocs(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val rows = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, WavCodec.encodePcm16(8000, (id % 800 + 100).toInt,
          i => (((id * 31 + i * 7) % 65536) - 32768).toInt))
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Decode stats straight off real WAV bytes: rate/length from the
    * header, exact sample sum and peak from the PCM payload. */
  def decodeWavStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", LongType),
      StructField("duration_ms", LongType),
      StructField("sum_pcm", LongType),
      StructField("peak_abs", LongType)))
    val rows = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val d = WavCodec.decode(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), d.sampleRate, d.nSamples, d.durationMs,
          d.sumPcm, d.peakAbs)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Decode stats straight off real BMP bytes: dimensions from the
    * header, exact channel-byte sum from the pixel rows. */
  def decodeBmpStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_px", LongType),
      StructField("sum_rgb", LongType)))
    val rows = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val d = BmpCodec.decode(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), d.width, d.height, d.nPx, d.sumRgb)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  // ---- query-map entries (#38, #39) ----

  /** Image rows are REAL BMPs and audio rows REAL WAVs here:
    * width/height and duration in the Spark result come from
    * [[withMeta]]'s expression-level header parses of the payload
    * bytes, while the oracle derives the same numbers from the
    * generators' closed forms (exact BMP size 54 + padded-row·h; exact
    * WAV size 44 + 2·samples) — so a hash match proves both header
    * reads. */
  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    withMeta(typedMediaFromDocs(Tables.documents(spark, dir), "doc_id", "text"))
      .select("media_id", "media_type", "n_bytes", "width", "height",
        "duration_ms", "frame_count")

  def mmMetaOracleSql: String =
    """SELECT doc_id AS media_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      |  CASE WHEN doc_id % 3 = 0
      |       THEN CAST(54 + ((3 * (doc_id % 24 + 8) + 3) // 4) * 4 * (doc_id % 16 + 8) AS INT)
      |       WHEN doc_id % 3 = 1
      |       THEN CAST(44 + 2 * (doc_id % 800 + 100) AS INT)
      |       ELSE CAST(octet_length(encode(text)) AS INT) END AS n_bytes,
      |  CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 24 + 8 AS INT) END AS width,
      |  CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 16 + 8 AS INT) END AS height,
      |  CASE WHEN doc_id % 3 = 1 THEN CAST((doc_id % 800 + 100) * 1000 // 8000 AS BIGINT)
      |       WHEN doc_id % 3 = 2 THEN CAST(octet_length(encode(text)) * 8 AS BIGINT) END AS duration_ms,
      |  CASE WHEN doc_id % 3 = 2 THEN CAST(octet_length(encode(text)) // 100 + 1 AS INT) END AS frame_count
      |FROM documents""".stripMargin

  /** Real audio-decode gate: encode every doc as an actual 8 kHz PCM16
    * WAV, decode the BYTES back (header parse + sample walk), emit
    * stats the oracle predicts from the generator's closed form — the
    * audio twin of [[mmDecodeBmp]]. */
  def mmDecodeWav(spark: SparkSession, dir: String): DataFrame =
    decodeWavStats(wavMediaFromDocs(Tables.documents(spark, dir), "doc_id"))

  def mmDecodeWavOracleSql: String =
    """WITH p AS (
      |  SELECT doc_id, CAST(doc_id % 800 + 100 AS BIGINT) AS n FROM documents
      |), s AS (
      |  SELECT doc_id, n, ((doc_id * 31 + i.v * 7) % 65536) - 32768 AS a
      |  FROM p, unnest(generate_series(0, n - 1)) AS i(v)
      |)
      |SELECT doc_id AS media_id, CAST(8000 AS INT) AS sample_rate,
      |  n AS n_samples,
      |  CAST(n * 1000 // 8000 AS BIGINT) AS duration_ms,
      |  CAST(sum(a) AS BIGINT) AS sum_pcm,
      |  CAST(max(abs(a)) AS BIGINT) AS peak_abs
      |FROM s GROUP BY doc_id, n""".stripMargin

  /** Deterministic REAL-PNG media table: same closed-form dimensions
    * and pixels as [[bmpMediaFromDocs]], but encoded through the full
    * PNG chunk grammar with zlib deflate and per-row filter rotation
    * ([[PngCodec]]) — the compressed-format sibling of the BMP gate. */
  def pngMediaFromDocs(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val rows = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (id % 24 + 8).toInt
        val h = (id % 16 + 8).toInt
        Row(id, PngCodec.encodeGray(w, h,
          (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt))
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Decode stats straight off real PNG bytes: chunk walk, inflate,
    * all five un-filters — dimensions and the exact gray sum. */
  def decodePngStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_px", LongType),
      StructField("sum_gray", LongType)))
    val rows = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val d = PngCodec.decode(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), d.width, d.height, d.nPx, d.sumGray)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Real compressed-image decode gate: every doc an actual zlib-PNG
    * with the per-row filter rotation, decoded back byte-level; the
    * oracle predicts every stat from the generator's closed form — a
    * hash match proves signature/chunk/CRC handling, inflate, and all
    * five filter reconstructions at once. */
  def mmDecodePng(spark: SparkSession, dir: String): DataFrame =
    decodePngStats(pngMediaFromDocs(Tables.documents(spark, dir), "doc_id"))

  def mmDecodePngOracleSql: String =
    """WITH p AS (
      |  SELECT doc_id, CAST(doc_id % 24 + 8 AS INT) AS w,
      |         CAST(doc_id % 16 + 8 AS INT) AS h
      |  FROM documents
      |), px AS (
      |  SELECT doc_id, w, h,
      |    CAST((doc_id * 31 + x.v * 7 + y.v * 13) % 256 AS BIGINT) AS g
      |  FROM p, unnest(generate_series(0, w - 1)) AS x(v),
      |       unnest(generate_series(0, h - 1)) AS y(v)
      |)
      |SELECT doc_id AS media_id, w AS width, h AS height,
      |  CAST(w AS BIGINT) * h AS n_px,
      |  CAST(sum(g) AS BIGINT) AS sum_gray
      |FROM px GROUP BY doc_id, w, h""".stripMargin

  /** Deterministic REAL-GIF media table: same closed-form dimensions
    * and pixels as [[bmpMediaFromDocs]]/[[pngMediaFromDocs]], through
    * the genuine LZW pipeline ([[GifCodec]]). */
  def gifMediaFromDocs(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val rows = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (id % 24 + 8).toInt
        val h = (id % 16 + 8).toInt
        Row(id, GifCodec.encodeGray(w, h,
          (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt))
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Decode stats off real GIF bytes: header walk, LZW inflate with
    * full dictionary growth, palette readout. */
  def decodeGifStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_px", LongType),
      StructField("sum_gray", LongType)))
    val rows = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val d = GifCodec.decode(r.getAs[Array[Byte]]("payload"))
        Row(r.getLong(0), d.width, d.height, d.nPx, d.sumGray)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Real LZW decode gate: the oracle predicts every stat from the
    * generator's closed form; a hash match proves the header walk, the
    * variable-width LSB bit unpacking, the dictionary growth (incl.
    * the w+w[0] case and CLEAR resets), and the palette readout. */
  def mmDecodeGif(spark: SparkSession, dir: String): DataFrame =
    decodeGifStats(gifMediaFromDocs(Tables.documents(spark, dir), "doc_id"))

  def mmDecodeGifOracleSql: String = mmDecodePngOracleSql // same closed form

  /** Deterministic REAL animated-GIF media table — the video slot's
    * upgrade from opaque stand-in bytes: (id % 5 + 2) full frames per
    * doc, per-frame pixels closed-form in (id, frame, x, y), genuine
    * LZW per frame. */
  def videoMediaFromDocs(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("payload", BinaryType)))
    val rows = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (id % 24 + 8).toInt
        val h = (id % 16 + 8).toInt
        Row(id, GifCodec.encodeAnimation(w, h, (id % 5 + 2).toInt,
          (f, x, y) => ((id * 31 + f * 97 + x * 7 + y * 13) % 256).toInt))
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Per-frame decode stats off the real animated GIF: one row per
    * (media_id, frame_idx). */
  def decodeVideoFrameStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_gray", LongType)))
    val rows = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        GifCodec.decodeFrames(r.getAs[Array[Byte]]("payload"))
          .zipWithIndex.map { case (d, i) =>
            Row(id, i, d.width, d.height, d.sumGray)
          }
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Real VIDEO decode gate: every doc an actual multi-frame animated
    * GIF, each frame LZW-decoded; the oracle predicts every per-frame
    * stat from the generator's closed form — frame count, dimensions,
    * and pixel sums all proven by the hash match. Retires the last
    * media type whose decode was a declared stand-in. */
  def mmVideoFrames(spark: SparkSession, dir: String): DataFrame =
    decodeVideoFrameStats(
      videoMediaFromDocs(Tables.documents(spark, dir), "doc_id"))

  def mmVideoFramesOracleSql: String =
    """WITH p AS (
      |  SELECT doc_id, CAST(doc_id % 24 + 8 AS INT) AS w,
      |         CAST(doc_id % 16 + 8 AS INT) AS h,
      |         CAST(doc_id % 5 + 2 AS INT) AS nf
      |  FROM documents
      |), px AS (
      |  SELECT doc_id, w, h, f.v AS frame_idx,
      |    CAST((doc_id * 31 + f.v * 97 + x.v * 7 + y.v * 13) % 256 AS BIGINT) AS g
      |  FROM p, unnest(generate_series(0, nf - 1)) AS f(v),
      |       unnest(generate_series(0, w - 1)) AS x(v),
      |       unnest(generate_series(0, h - 1)) AS y(v)
      |)
      |SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
      |  w AS width, h AS height,
      |  CAST(sum(g) AS BIGINT) AS sum_gray
      |FROM px GROUP BY doc_id, frame_idx, w, h""".stripMargin

  def mmResize(spark: SparkSession, dir: String): DataFrame =
    resizePlan(
      withMeta(mediaFromDocs(Tables.documents(spark, dir), "doc_id", "text")),
      targetW = 224, targetH = 224)

  def mmResizeOracleSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CAST(octet_length(encode(text)) % 512 + 64 AS INT) AS width,
      |    CAST(octet_length(encode(text)) % 384 + 64 AS INT) AS height
      |  FROM documents WHERE doc_id % 3 = 0
      |), s AS (
      |  SELECT *, least(224.0 / width, 224.0 / height, 1.0) AS sc FROM m
      |)
      |SELECT media_id, width, height,
      |  CAST(floor(width * sc) AS INT) AS out_w,
      |  CAST(floor(height * sc) AS INT) AS out_h,
      |  CAST(floor(width * sc) AS BIGINT) * CAST(floor(height * sc) AS BIGINT) * 3 AS out_bytes
      |FROM s""".stripMargin

  /** Real-decode gate: encode every doc as an actual BMP, decode the
    * BYTES back (header parse + padded-row walk), emit stats. The
    * oracle predicts them from the generator's closed form — so the
    * hash gate proves the decoder reads back exactly what a spec-valid
    * encoder wrote. Planted-pixel byte-level checks live in BmpSpec. */
  def mmDecodeBmp(spark: SparkSession, dir: String): DataFrame =
    decodeBmpStats(bmpMediaFromDocs(Tables.documents(spark, dir), "doc_id"))

  def mmDecodeBmpOracleSql: String =
    """WITH p AS (
      |  SELECT doc_id, CAST(doc_id % 24 + 8 AS INT) AS w,
      |         CAST(doc_id % 16 + 8 AS INT) AS h
      |  FROM documents
      |), px AS (
      |  SELECT doc_id, w, h,
      |    CAST((doc_id * 31 + x.v * 7 + y.v * 13) % 256 AS BIGINT) AS g
      |  FROM p, unnest(generate_series(0, w - 1)) AS x(v),
      |       unnest(generate_series(0, h - 1)) AS y(v)
      |)
      |SELECT doc_id AS media_id, w AS width, h AS height,
      |  CAST(w AS BIGINT) * h AS n_px,
      |  CAST(3 * sum(g) AS BIGINT) AS sum_rgb
      |FROM px GROUP BY doc_id, w, h""".stripMargin

  def mmFramesample(spark: SparkSession, dir: String): DataFrame =
    frameSample(
      withMeta(mediaFromDocs(Tables.documents(spark, dir), "doc_id", "text")),
      every = 10)

  def mmFramesampleOracleSql: String =
    """SELECT doc_id AS media_id,
      |  CAST(unnest(generate_series(0, octet_length(encode(text)) // 100, 10)) AS INT) AS frame_idx,
      |  CAST(unnest(generate_series(0, octet_length(encode(text)) // 100, 10)) AS BIGINT) * 100 AS byte_offset
      |FROM documents WHERE doc_id % 3 = 2""".stripMargin
}
