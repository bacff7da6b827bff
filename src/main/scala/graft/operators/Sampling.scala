package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic stratified sub-sampling to target per-stratum fractions —
  * training-mix construction, the counterpart of the reference's FLAN
  * submix builder (/root/reference/MachineLearning/Data/flan2022_submix/
  * spark_data_generating.py:29-60: per-source `.sample(frac, seed)` then
  * union to target proportions).
  *
  * Where the reference relies on Spark's seeded Bernoulli sampler (whose
  * kept-set changes if partitioning changes), this keeps a row iff
  * `hash(id) mod M < frac·M` — a pure row-value decision: deterministic
  * across runs, engines, partitionings, and cluster sizes; no global
  * count, no shuffle, no skew; fully codegen'd filter that stacks with
  * partition pruning. Re-running the mix on a grown corpus keeps every
  * previously-kept row (reproducible training sets).
  */
object Sampling {

  val M = 1000000L

  /** Portable multiplicative-LCG bucket in [0, M) from an integer id —
    * expressible identically in any SQL engine (unlike xxhash64). */
  def portableBucket(id: Column): Column =
    (((id % 100003L) * 1103515245L + 12345L) % M + M) % M

  /** Keep rows of stratum s with probability fracs(s), deterministically.
    * Strata absent from `fracs` are dropped (frac 0). */
  def submix(df: DataFrame, stratumCol: String, idCol: String,
             fracs: Map[String, Double]): DataFrame = {
    val frac = fracs.foldLeft(lit(0.0)) { case (acc, (s, f)) =>
      when(col(stratumCol) === s, lit(f)).otherwise(acc)
    }
    df.filter(portableBucket(col(idCol)) < (frac * M).cast("long"))
  }

  /** Deterministic train/val/test assignment: split s covers the bucket
    * range [cum(s), cum(s)+frac(s))·M, so every row gets exactly one
    * label, stable across runs/engines/partitionings, and growing the
    * corpus never reassigns an existing row. Fractions must sum to
    * exactly 1 (enforced) — an unnamed remainder bucket would silently
    * mislabel rows as the last split. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val bucket = portableBucket(col(idCol))
    val cuts = splits.scanLeft(0.0)(_ + _._2).map(f => (f * M).toLong)
    val expr = splits.init.zipWithIndex.foldRight(lit(splits.last._1): Column) {
      case (((name, _), i), acc) => when(bucket < cuts(i + 1), name).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  // ---- query-map entry (#22) ----

  /** The reference submix shape: heavy/medium/light strata + dropped rest. */
  val DemoFracs: Map[String, Double] = Map(
    "src0" -> 0.8, "src1" -> 0.8, "src2" -> 0.5, "src3" -> 0.5,
    "src4" -> 0.25, "src5" -> 0.25, "src6" -> 0.1)

  def submixDocuments(spark: SparkSession, dir: String): DataFrame =
    submix(Tables.documents(spark, dir), "source", "doc_id", DemoFracs)
      .select("doc_id", "source", "lang", "n_chars")

  /** Query-map entry (extra beyond SURVEY §2): 80/10/10 split of the
    * document corpus. */
  def hashSplitDocuments(spark: SparkSession, dir: String): DataFrame =
    hashSplit(Tables.documents(spark, dir), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "source", "split")

  def hashSplitOracleSql: String =
    """SELECT doc_id, source,
      |  CASE WHEN ((doc_id % 100003) * 1103515245 + 12345) % 1000000 < 800000 THEN 'train'
      |       WHEN ((doc_id % 100003) * 1103515245 + 12345) % 1000000 < 900000 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents""".stripMargin

  def oracleSql: String =
    """SELECT doc_id, source, lang, n_chars FROM documents
      |WHERE ((doc_id % 100003) * 1103515245 + 12345) % 1000000 <
      |  CAST((CASE source
      |    WHEN 'src0' THEN 0.8 WHEN 'src1' THEN 0.8
      |    WHEN 'src2' THEN 0.5 WHEN 'src3' THEN 0.5
      |    WHEN 'src4' THEN 0.25 WHEN 'src5' THEN 0.25
      |    WHEN 'src6' THEN 0.1 ELSE 0.0 END) * 1000000 AS BIGINT)""".stripMargin
}
