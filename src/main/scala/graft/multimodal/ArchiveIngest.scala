package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, ZipEntry, ZipInputStream, ZipOutputStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Zip-archive ingest for multimodal corpora — the counterpart of the
  * reference's blob-archive scanner
  * (/root/reference/DataEngineering/DataBricks/async_scan_blob_zip_contents.py:18-69:
  * list zip blobs, open each, enumerate members into rows). Training
  * corpora routinely arrive as millions of small files packed into
  * archives; the engine-side contract is rows of (archive, member,
  * payload), not a filesystem walk.
  *
  * Scale shape: expansion is a pure per-row flatMap — one archive row in,
  * N member rows out, no shuffle, no driver involvement; archives spread
  * across partitions give free parallelism. Member payloads are
  * CRC-verified by the zip format on read (ZipInputStream throws on
  * corruption, so silent truncation cannot pass). The packer side is
  * groupByKey→one zip per bounded group — only useful for testing and
  * re-sharding; real corpora arrive pre-packed.
  */
object ArchiveIngest {

  /** Deterministic zip bytes for (name, payload) members: fixed entry
    * timestamp (zip stores local mtimes; "now" would break result
    * hashing) and STORED-or-DEFLATED left to the default deflater with
    * fixed level — same input bytes, same archive bytes, every run. */
  def zipArchive(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    members.foreach { case (name, bytes) =>
      val e = new ZipEntry(name)
      e.setTime(0L) // epoch, not wall clock: archives must be byte-stable
      zos.putNextEntry(e)
      zos.write(bytes)
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  /** Enumerate one archive's members: (name, size, crc32, payload).
    * Reads via ZipInputStream so member payloads are CRC-checked. */
  def unzipArchive(archive: Array[Byte]): Seq[(String, Long, Long, Array[Byte])] = {
    val zis = new ZipInputStream(new java.io.ByteArrayInputStream(archive))
    val out = Seq.newBuilder[(String, Long, Long, Array[Byte])]
    var e = zis.getNextEntry
    while (e != null) {
      val bytes = zis.readAllBytes()
      val crc = new CRC32()
      crc.update(bytes)
      out += ((e.getName, bytes.length.toLong, crc.getValue, bytes))
      e = zis.getNextEntry
    }
    zis.close()
    out.result()
  }

  /** Pack rows into one archive per `groupSize` ids: (archive_id,
    * archive binary). Members are sorted by name within an archive so
    * packing is order-independent — the same rows give the same bytes
    * regardless of partitioning. */
  def pack(df: DataFrame, idCol: String, payloadCol: String,
           groupSize: Int): DataFrame = {
    import df.sparkSession.implicits._
    // DIV stays in long arithmetic (no double detour losing precision past
    // 2^53) and truncates toward zero exactly like DuckDB's integer `//`.
    df.select(expr(s"CAST($idCol AS BIGINT) DIV $groupSize").as("archive_id"),
        col(idCol).cast("string").as("__name"), col(payloadCol).cast("binary").as("__bytes"))
      .as[(Long, String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (aid, rows) =>
        val members = rows.map(r => (r._2, r._3)).toSeq.sortBy(_._1)
        (aid, zipArchive(members))
      }
      .toDF("archive_id", "archive")
  }

  /** Expand archive rows into member rows: (archive_id, member_name,
    * member_size, member_crc, member_bytes). */
  def expand(archives: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    import archives.sparkSession.implicits._
    archives.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (aid, bytes) =>
        unzipArchive(bytes).map { case (n, sz, crc, b) => (aid, n, sz, crc, b) }
      }
      .toDF("archive_id", "member_name", "member_size", "member_crc", "member_bytes")
  }

  // ---- query-map entry (hash-gated) ----

  /** Full pack→expand roundtrip over the documents table: 50 docs per
    * archive, members restored and decoded back to text. The oracle is
    * the documents table itself — so the zip write, the member walk, the
    * CRC-verified read, and the UTF-8 roundtrip are all inside the hash
    * gate. */
  def mmZipExpand(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(
      col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val packed = pack(docs, "doc_id", "payload", groupSize = 50)
    expand(packed, "archive_id", "archive")
      .select(col("member_name").cast("bigint").as("doc_id"),
        col("archive_id"),
        decode(col("member_bytes"), "UTF-8").as("member_text"),
        col("member_size"))
  }

  def oracleSql: String =
    """SELECT doc_id, CAST(doc_id // 50 AS BIGINT) AS archive_id,
      |  text AS member_text,
      |  CAST(strlen(text) AS BIGINT) AS member_size
      |FROM documents""".stripMargin
}
