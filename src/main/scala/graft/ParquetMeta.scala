package graft

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Metadata-only parquet statistics.
  *
  * `DataFrame.count()` over a parquet scan runs a full (column-pruned)
  * scan job — Spark does not answer count(*) from footers unless DSv2
  * aggregate pushdown is enabled, which it is not by default. When a
  * row count is needed only to SIZE something (a repartition width, a
  * state bound) the footers already hold it exactly: every parquet
  * footer records its blocks' row counts. Reading them is O(#files)
  * driver-side metadata I/O — no executor job, no data pages touched.
  */
object ParquetMeta {

  /** Exact row count of a parquet file or directory-of-part-files,
    * summed from footers alone. */
  def rowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        val r = ParquetFileReader.open(HadoopInputFile.fromStatus(f, conf))
        try n += r.getRecordCount finally r.close()
      }
    }
    n
  }
}
