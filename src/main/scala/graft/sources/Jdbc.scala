package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JDBC table/query source — the generic external-database read contract,
  * counterpart of the reference's SQL-warehouse pulls
  * (/root/reference/DataEngineering/DataBricks/spark_read_sql.py:1-25 and
  * spark_read_kusto.py:1-37: connector reads with a pushed query and a
  * partitioned fetch). Built on Spark's own JDBC source so Catalyst
  * keeps filter/column pushdown (`.filter`/`.select` on the returned
  * frame land in the remote WHERE clause / SELECT list — visible as
  * `PushedFilters` on the scan).
  *
  * Scale stance: an unpartitioned JDBC read is ONE task pulling the whole
  * table through one connection — fine for dims, fatal for facts. For
  * anything sizable pass [[Partitioning]]: Spark splits the key range
  * into `numPartitions` slices, one connection each, and the warehouse
  * does the slicing WHERE. That is the spark_read_sql `numPartitions /
  * partitionColumn` shape, and the knob a 1000-executor cluster needs to
  * not serialize on the source.
  */
object Jdbc {

  /** Range partitioning of the fetch: `numPartitions` parallel readers
    * slicing `[lowerBound, upperBound]` on numeric/date `column`. Bounds
    * only shape the slices — rows OUTSIDE the bounds still arrive (first
    * and last slice are unbounded), matching Spark's contract. */
  final case class Partitioning(column: String, lowerBound: Long,
                                upperBound: Long, numPartitions: Int)

  /** Read a table (or `(subquery) alias`) over JDBC. `props` carries
    * driver/user/password/fetchsize options verbatim. */
  def read(spark: SparkSession, url: String, table: String,
           partitioning: Option[Partitioning] = None,
           props: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(props)
    val withParts = partitioning.fold(base) { p =>
      base.option("partitionColumn", p.column)
        .option("lowerBound", p.lowerBound)
        .option("upperBound", p.upperBound)
        .option("numPartitions", p.numPartitions)
    }
    withParts.load()
  }

  /** Read an arbitrary SQL query, pushed whole to the database —
    * spark_read_sql.py's `query` mode. (Mutually exclusive with range
    * partitioning by Spark's JDBC contract: a pushed query has no
    * partition column metadata.) */
  def readQuery(spark: SparkSession, url: String, query: String,
                props: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
      .options(props)
      .load()

  // ---- write side (databricks_synapse_sql_writer.py:1-200: dynamic DDL
  // from the frame's schema, then a batched write) ----

  /** ANSI SQL type for a Spark type — the writer's dynamic-DDL mapping
    * (the reference generates Synapse DDL from the parquet schema the
    * same way; varcharLen mirrors its fixed-width NVARCHAR choice).
    * Emissions stick to ANSI spellings every major target parses
    * (DOUBLE PRECISION, not the DuckDB/Derby-only DOUBLE shorthand).
    * BooleanType is the one type with no portable spelling — SQL Server /
    * Synapse (the reference writer's target) has BIT, PostgreSQL/Derby
    * BOOLEAN — so it takes the dialect's spelling via `booleanDdl`. */
  def sqlTypeFor(dt: DataType, varcharLen: Int = 4000,
                 booleanDdl: String = "BOOLEAN"): String = dt match {
    case BooleanType => booleanDdl
    case ByteType | ShortType => "SMALLINT"
    case IntegerType => "INTEGER"
    case LongType => "BIGINT"
    case FloatType => "REAL"
    case DoubleType => "DOUBLE PRECISION"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case StringType => s"VARCHAR($varcharLen)"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case other =>
      throw new IllegalArgumentException(
        s"no JDBC DDL mapping for ${other.simpleString}: project it away or cast first")
  }

  /** CREATE TABLE statement for a frame's schema — executable on the
    * target before [[write]], the reference's table-generation step. */
  def createTableDdl(table: String, schema: StructType,
                     varcharLen: Int = 4000,
                     booleanDdl: String = "BOOLEAN"): String =
    schema.fields.map { f =>
      val nn = if (f.nullable) "" else " NOT NULL"
      s"${f.name} ${sqlTypeFor(f.dataType, varcharLen, booleanDdl)}$nn"
    }.mkString(s"CREATE TABLE $table (", ", ", ")")

  /** Write a frame to a JDBC table. Each partition writes through its own
    * connection in `batchSize`d inserts — the distributed shape: fan-in
    * parallelism is the frame's partition count, so repartition to the
    * warehouse's comfortable writer count before calling. */
  def write(df: DataFrame, url: String, table: String,
            mode: String = "append", batchSize: Int = 1000,
            props: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .options(props)
      .mode(mode)
      .save()
}
