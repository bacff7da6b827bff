package graft.streaming

import java.util.{Map => JMap}

import scala.collection.JavaConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.example.data.Group
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.VersionedTable

/** Structured Streaming SOURCE over the [[VersionedTable]] commit log —
  * the read half of the streaming lakehouse loop whose write half is
  * [[VersionedTableSink]]. The reference consumes Delta tables as
  * streams (`spark.readStream.format("delta")`,
  * /root/reference/DataEngineering/DataBricks/spark_stream.py reads a
  * stream and lands it in Delta; downstream jobs re-stream the table);
  * this is that contract on the portable layer, built ONLY on the
  * public DataSource V2 interfaces: offsets are commit VERSIONS, each
  * micro-batch is the half-open version range (start, end], and a
  * batch's input partitions are exactly the parquet files of the
  * appended file groups — no snapshot diff, no history scan.
  *
  * Semantics (Delta's streaming-read contract):
  *  - append commits stream through;
  *  - compaction commits are data-neutral and are SKIPPED (their
  *    rewritten bytes must not re-deliver);
  *  - upsert/overwrite commits in the streamed range fail loudly —
  *    a version-offset stream cannot represent row retirement; the
  *    change-feed consumer ([[VersionedTableConsumer]]) is the API for
  *    that surface.
  *
  * Exactly-once: the engine checkpoints the version offsets; on
  * restart `planInputPartitions` replans the same range from the same
  * immutable file groups. `Trigger.AvailableNow` pins the head at
  * prepare time ([[SupportsTriggerAvailableNow]]), and
  * `maxVersionsPerBatch` bounds batch width under admission control
  * (Delta's `maxFilesPerTrigger` dial at version granularity).
  *
  * Scale stance: planning is O(log tail) driver work on the JSON log;
  * reading is one task per parquet file with no shuffle — the scan
  * parallelism is the file-group layout the writers already chose.
  * Value decoding covers the flat primitive surface the table layer
  * writes (long/int/double/float/boolean/string/date/binary,
  * INT64-micros timestamps); nested/decimal columns are rejected at
  * plan time rather than silently misread.
  */
object VersionedTableStream {
  val ShortName = "graft-vtable"

  private[streaming] def addedDirsForRange(
      spark: SparkSession, table: String, fromExclusive: Long,
      toInclusive: Long): Seq[(Long, Seq[String])] = {
    val commits = VersionedTable.history(spark, table)
      .filter(c => c.version > fromExclusive && c.version <= toInclusive)
    commits.flatMap { c =>
      c.op match {
        case "append"  => Some(c.version -> c.add)
        case "compact" => None // data-neutral rewrite
        case other => sys.error(
          s"streamed range ($fromExclusive, $toInclusive] contains a " +
            s"'$other' commit at version ${c.version}: version-offset " +
            "streaming covers append-only tables; consume row " +
            "retirement through the change feed instead")
      }
    }
  }

  private[streaming] def parquetFiles(
      spark: SparkSession, table: String, dirs: Seq[String]): Seq[String] = {
    val fs = new Path(table).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    dirs.flatMap { d =>
      val p = new Path(new Path(table, "data"), d)
      fs.listStatus(p).toSeq
        .map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
        .map(_.toString)
        .sorted
    }
  }

  private[streaming] def checkSupported(schema: StructType): Unit =
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType | IntegerType | DoubleType | FloatType |
             BooleanType | StringType | DateType | TimestampType |
             BinaryType => ()
        case dt => sys.error(
          s"graft-vtable streaming does not decode column " +
            s"'${f.name}' of type ${dt.simpleString}")
      }
    }
}

/** `spark.readStream.format("graft-vtable").load(path)` entry point. */
class VersionedTableStreamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = VersionedTableStream.ShortName

  private def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-vtable requires a path")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VersionedTable.read(SparkSession.active, path(options)).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val o = new CaseInsensitiveStringMap(properties)
    new VersionedTableStreamTable(
      o.get("path"), schema,
      Option(o.get("startingVersion")).map(_.toLong).getOrElse(0L),
      Option(o.get("maxVersionsPerBatch")).map(_.toLong))
  }
}

class VersionedTableStreamTable(tablePath: String, tableSchema: StructType,
                                startingVersion: Long,
                                maxVersionsPerBatch: Option[Long])
    extends Table with SupportsRead {
  require(tablePath != null && tablePath.nonEmpty,
    "graft-vtable requires a path")
  override def name(): String = s"graft-vtable(`$tablePath`)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def description(): String = name()
        override def toMicroBatchStream(
            checkpointLocation: String): MicroBatchStream =
          new VersionedTableMicroBatchStream(
            tablePath, tableSchema, startingVersion, maxVersionsPerBatch)
      }
    }
}

/** Offset = newest DELIVERED commit version (half-open ranges). */
case class VersionedTableOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

class VersionedTableMicroBatchStream(table: String, schema: StructType,
                                     startingVersion: Long,
                                     maxVersionsPerBatch: Option[Long])
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  VersionedTableStream.checkSupported(schema)
  private def spark = SparkSession.active
  // head pinned by prepareForTriggerAvailableNow, else live
  @volatile private var pinnedHead: Option[Long] = None

  private def head: Long =
    VersionedTable.latestVersion(spark, table).getOrElse(-1L)

  override def prepareForTriggerAvailableNow(): Unit =
    pinnedHead = Some(head)

  override def initialOffset(): Offset =
    VersionedTableOffset(startingVersion - 1)

  override def deserializeOffset(json: String): Offset =
    VersionedTableOffset(json.trim.toLong)

  override def latestOffset(): Offset =
    VersionedTableOffset(pinnedHead.getOrElse(head))

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[VersionedTableOffset].version
    val h = pinnedHead.getOrElse(head)
    val capped = maxVersionsPerBatch match {
      case Some(m) => math.min(h, s + m)
      case None    => h
    }
    VersionedTableOffset(math.max(s, capped))
  }

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionedTableOffset].version
    val e = end.asInstanceOf[VersionedTableOffset].version
    if (e <= s) return Array.empty
    val dirs = VersionedTableStream
      .addedDirsForRange(spark, table, s, e).flatMap(_._2)
    VersionedTableStream.parquetFiles(spark, table, dirs)
      .map(f => VersionedTableInputPartition(f): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VersionedTableReaderFactory(schema)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class VersionedTableInputPartition(file: String) extends InputPartition

class VersionedTableReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new VersionedTableGroupReader(
      partition.asInstanceOf[VersionedTableInputPartition].file, schema)
}

/** Executor-side reader: parquet example Groups → InternalRows for the
  * flat primitive schema the table layer writes. Missing fields (older
  * groups under schema evolution) and zero-repetition values are null. */
class VersionedTableGroupReader(file: String, schema: StructType)
    extends PartitionReader[InternalRow] {
  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new Path(file))
      .withConf(new Configuration())
      .build()
  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val g = current
    val gt = g.getType
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      val fi = if (gt.containsField(f.name)) gt.getFieldIndex(f.name) else -1
      vals(i) =
        if (fi < 0 || g.getFieldRepetitionCount(fi) == 0) null
        else f.dataType match {
          case LongType      => g.getLong(fi, 0)
          case IntegerType   => g.getInteger(fi, 0)
          case DoubleType    => g.getDouble(fi, 0)
          case FloatType     => g.getFloat(fi, 0)
          case BooleanType   => g.getBoolean(fi, 0)
          case StringType    =>
            UTF8String.fromBytes(g.getBinary(fi, 0).getBytes)
          case DateType      => g.getInteger(fi, 0)
          case TimestampType => g.getLong(fi, 0) // INT64 micros
          case BinaryType    => g.getBinary(fi, 0).getBytes
          case dt => sys.error(s"unsupported type ${dt.simpleString}")
        }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  override def close(): Unit = reader.close()
}
