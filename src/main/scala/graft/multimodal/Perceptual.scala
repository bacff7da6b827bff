package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Perceptual fingerprints over REAL decoded media — the
  * multimodal × dedup crossover: training-data pipelines dedup images
  * and audio by CONTENT, not bytes, and the fingerprint step runs
  * after a real decode. Image aHash (average hash): exact 8×8
  * area-mapped downsample (pixel (x,y) belongs to block
  * ((x·8) div w, (y·8) div h)), bit = block mean > global mean by
  * CROSS-MULTIPLIED integer comparison (bsum·n_px > total·bn — no
  * rational ever materialized), 64 bits carried as two 32-bit BIGINT
  * halves so neither engine touches the sign bit. Audio fingerprint:
  * per-100-sample absolute-energy windows, bit = energy rises between
  * consecutive windows (the Shazam-family sign-of-delta shape), all
  * exact sums of |PCM16| samples.
  *
  * Both gated instances PLANT clusters (image pixels keyed by
  * id div 20, so 20 consecutive docs share identical content) and the
  * Spark side computes from DECODED BYTES (BMP/WAV codec walk) while
  * the oracle predicts from the generator closed forms — the hash
  * match proves decode AND fingerprint math at once.
  */
object Perceptual {

  /** aHash halves from decoded grayscale pixels. */
  def aHash(w: Int, h: Int, px: Array[Int]): (Long, Long) = {
    val nPx = w.toLong * h
    var total = 0L
    px.foreach(total += _)
    val bsum = new Array[Long](64)
    val bn = new Array[Long](64)
    var i = 0
    while (i < px.length) {
      val x = i % w; val y = i / w
      val b = (y * 8 / h) * 8 + (x * 8 / w)
      bsum(b) += px(i); bn(b) += 1
      i += 1
    }
    var hi = 0L; var lo = 0L
    for (b <- 0 until 64) {
      if (bsum(b) * nPx > total * bn(b)) {
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
    }
    (hi, lo)
  }

  /** Cluster-seeded BMP table: 20 consecutive docs share one image. */
  def phashMediaFromDocs(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("payload", BinaryType)))
    val rows = docs.select(col(idCol).cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val seed = id / 20
        val w = (seed % 24 + 8).toInt
        val h = (seed % 16 + 8).toInt
        Row(id, BmpCodec.encodeGray(w, h,
          (x, y) => ((seed * 31 + x * 7 + y * 13) % 256).toInt))
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Per-cluster rows (phash_hi, phash_lo, n_images, min_id) — images
    * decoded byte-level, hashed, grouped by identical fingerprint. */
  def imagePhashClusters(spark: SparkSession, dir: String): DataFrame = {
    val media = phashMediaFromDocs(Tables.documents(spark, dir), "doc_id")
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("phash_hi", LongType), StructField("phash_lo", LongType)))
    val hashed = spark.createDataFrame(
      media.select("media_id", "payload").rdd.mapPartitions { it =>
        it.map { r =>
          val d = BmpCodec.decode(r.getAs[Array[Byte]]("payload"))
          // gray = channel value; decoder reports the RGB sum, so walk
          // the pixels again through the codec's gray readout
          val g = BmpCodec.decodeGrayPixels(r.getAs[Array[Byte]]("payload"))
          val (hi, lo) = aHash(d.width, d.height, g)
          Row(r.getLong(0), hi, lo)
        }
      }, schema)
    hashed.groupBy(col("phash_hi"), col("phash_lo"))
      .agg(count(lit(1)).as("n_images"), min(col("media_id")).as("min_id"))
  }

  def imagePhashOracleSql: String =
    """WITH p AS (
      |  SELECT doc_id, doc_id // 20 AS seed,
      |    CAST((doc_id // 20) % 24 + 8 AS INT) AS w,
      |    CAST((doc_id // 20) % 16 + 8 AS INT) AS h
      |  FROM documents
      |), seeds AS (
      |  SELECT seed, w, h, CAST(count(*) AS BIGINT) AS n_images,
      |    CAST(min(doc_id) AS BIGINT) AS min_id
      |  FROM p GROUP BY 1, 2, 3
      |), px AS (
      |  SELECT seed, w, h,
      |    ((y.v * 8) // h) * 8 + ((x.v * 8) // w) AS b,
      |    CAST((seed * 31 + x.v * 7 + y.v * 13) % 256 AS BIGINT) AS g
      |  FROM seeds, unnest(generate_series(0, w - 1)) AS x(v),
      |       unnest(generate_series(0, h - 1)) AS y(v)
      |), blocks AS (
      |  SELECT seed, b, sum(g) AS bsum, count(*) AS bn FROM px GROUP BY 1, 2
      |), totals AS (
      |  SELECT seed, sum(g) AS total, count(*) AS npx FROM px GROUP BY 1
      |), bits AS (
      |  SELECT bl.seed, bl.b,
      |    CASE WHEN bl.bsum * t.npx > t.total * bl.bn THEN 1 ELSE 0 END AS bit
      |  FROM blocks bl JOIN totals t ON bl.seed = t.seed
      |), hashes AS (
      |  SELECT seed,
      |    CAST(sum(CASE WHEN b >= 32 THEN bit * (1::BIGINT << (b - 32))
      |      ELSE 0 END) AS BIGINT) AS phash_hi,
      |    CAST(sum(CASE WHEN b < 32 THEN bit * (1::BIGINT << b)
      |      ELSE 0 END) AS BIGINT) AS phash_lo
      |  FROM bits GROUP BY 1
      |)
      |-- clusters are BY HASH: colliding seeds merge (observed at
      |-- sf0.1 — 64-bit aHash over small smooth images collides)
      |SELECT h.phash_hi, h.phash_lo,
      |  CAST(sum(s.n_images) AS BIGINT) AS n_images,
      |  CAST(min(s.min_id) AS BIGINT) AS min_id
      |FROM hashes h JOIN seeds s ON h.seed = s.seed
      |GROUP BY 1, 2""".stripMargin

  /** Per-clip rows (media_id, n_windows, fp_bits, total_abs_energy)
    * from real WAV bytes: 100-sample absolute-energy windows, bit set
    * where energy rises between consecutive complete windows. */
  def audioFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val media = BinaryMedia.wavMediaFromDocs(Tables.documents(spark, dir), "doc_id")
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_windows", IntegerType),
      StructField("fp_bits", LongType),
      StructField("total_abs_energy", LongType)))
    spark.createDataFrame(
      media.select("media_id", "payload").rdd.mapPartitions { it =>
        it.map { r =>
          val samples = WavCodec.decodeSamples(r.getAs[Array[Byte]]("payload"))
          val nw = samples.length / 100
          val energy = Array.tabulate(nw) { w =>
            var s = 0L
            var i = w * 100
            while (i < (w + 1) * 100) { s += math.abs(samples(i).toLong); i += 1 }
            s
          }
          var fp = 0L
          for (w <- 1 until nw) if (energy(w) > energy(w - 1)) fp |= 1L << (w - 1)
          var tot = 0L
          samples.foreach(s => tot += math.abs(s.toLong))
          Row(r.getLong(0), nw, fp, tot)
        }
      }, schema)
  }

  def audioFingerprintOracleSql: String =
    """WITH p AS (
      |  SELECT doc_id, CAST(doc_id % 800 + 100 AS BIGINT) AS n FROM documents
      |), s AS (
      |  SELECT doc_id, n, i.v AS idx, i.v // 100 AS win,
      |    abs(((doc_id * 31 + i.v * 7) % 65536) - 32768) AS a
      |  FROM p, unnest(generate_series(0, n - 1)) AS i(v)
      |), wins AS (
      |  SELECT doc_id, win, CAST(sum(a) AS BIGINT) AS e
      |  FROM s WHERE win < n // 100
      |  GROUP BY 1, 2
      |), bits AS (
      |  SELECT cur.doc_id,
      |    CASE WHEN cur.e > prv.e THEN 1::BIGINT << CAST(cur.win - 1 AS INT)
      |         ELSE 0 END AS bitval
      |  FROM wins cur JOIN wins prv
      |    ON cur.doc_id = prv.doc_id AND prv.win = cur.win - 1
      |), fp AS (
      |  SELECT doc_id, CAST(coalesce(sum(bitval), 0) AS BIGINT) AS fp_bits
      |  FROM bits GROUP BY 1
      |), tot AS (
      |  SELECT doc_id, CAST(n // 100 AS INT) AS n_windows,
      |    CAST(sum(a) AS BIGINT) AS total_abs_energy
      |  FROM s GROUP BY doc_id, n
      |)
      |SELECT t.doc_id AS media_id, t.n_windows,
      |  CAST(coalesce(f.fp_bits, 0) AS BIGINT) AS fp_bits,
      |  t.total_abs_energy
      |FROM tot t LEFT JOIN fp f ON t.doc_id = f.doc_id""".stripMargin
}
