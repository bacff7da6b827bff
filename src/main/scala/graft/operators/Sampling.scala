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

  /** Temperature-scaled mixture thresholds — the FLAN-style mixing-rate
    * computation (spark_data_generating.py's proportions are hand-set;
    * the published FLAN recipe derives them by temperature scaling):
    * stratum weight ∝ n^(1/T), so T=1 is proportional sampling and
    * T→∞ uniform across strata; per-stratum keep-fraction is
    * min(1, targetRows·w/Σw/n), returned as an integer bucket threshold
    * in [0, M] for [[portableBucket]] filtering. Thresholds are rounded
    * AT the M grain so the float arithmetic (pow/sum order) cannot flap
    * the cut row across engines. */
  def temperatureThresholds(counts: Seq[(String, Long)], temperature: Double,
                            targetRows: Double): Map[String, Long] = {
    val w = counts.map { case (s, n) => s -> math.pow(n.toDouble, 1.0 / temperature) }
    val total = w.map(_._2).sum
    w.zip(counts).map { case ((s, wt), (_, n)) =>
      s -> Math.round(math.min(1.0, targetRows * wt / total / n) * M)
    }.toMap
  }

  /** [[submix]] with temperature-derived fractions: strata counted with
    * one bounded groupBy (|strata| rows to the driver), thresholds
    * computed closed-form, then the same pure row-value filter — the
    * whole mix is still one codegen'd scan pass, no shuffle. */
  def submixTemperature(df: DataFrame, stratumCol: String, idCol: String,
                        temperature: Double, targetRows: Double): DataFrame = {
    val counts = df.groupBy(stratumCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    val thr = temperatureThresholds(counts, temperature, targetRows)
    val thrCol = thr.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, t)) => when(col(stratumCol) === s, lit(t)).otherwise(acc)
    }
    df.filter(portableBucket(col(idCol)) < thrCol)
  }

  /** Deterministic "reservoir" of exactly min(k, |group|) rows per
    * group: rank rows inside each group by (portableBucket(id), id) —
    * a uniform-ish pseudo-random but fully reproducible order — and
    * keep the first k. The per-group window is the only non-map stage
    * and each task holds one group's rows; the reference's per-group
    * `sample(n=...)` calls (generate_data.py:97) collapse to this
    * distributed form. */
  def sampleKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(portableBucket(col(idCol)), col(idCol))
    df.withColumn("__srn", row_number().over(w))
      .filter(col("__srn") <= k)
      .drop("__srn")
  }

  /** Deterministic training-shard export: the corpus in pseudo-random
    * [[portableBucket]] order, cut into fixed-size shards with a
    * position inside each — the "global shuffle then write N-row
    * shards" step every dataloader export runs before training.
    * shard = (rank−1) div shardSize, shard_pos = (rank−1) mod shardSize.
    *
    * Scale: the global order comes from [[Ranks.globalRowNumber]]
    * (range repartition + per-slice window + broadcast offsets), so no
    * corpus-wide single-partition window exists at any size; shard and
    * position are map-side arithmetic on the rank. Shard boundaries are
    * byte-stable across partitioning because the order
    * (bucket, id) is total. */
  def shardAssign(df: DataFrame, idCol: String, shardSize: Long): DataFrame = {
    require(shardSize >= 1, "shardSize must be >= 1")
    Ranks.globalRowNumber(df,
        Seq(portableBucket(col(idCol)), col(idCol)), "__grn")
      .withColumn("shard", expr(s"(__grn - 1) div $shardSize"))
      .withColumn("shard_pos", expr(s"(__grn - 1) % $shardSize"))
      .drop("__grn")
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

  /** Query-map entry: temperature-2 mix over language strata (lang counts
    * in the test corpus are genuinely non-uniform, so the scaling is
    * exercised, not degenerate), targeting ~250 rows. */
  def submixTemperatureDocuments(spark: SparkSession, dir: String): DataFrame =
    submixTemperature(Tables.documents(spark, dir), "lang", "doc_id",
      temperature = 2.0, targetRows = 250.0)
      .select("doc_id", "lang", "source")

  /** The oracle recomputes the thresholds in SQL: pow(n, 0.5) and the
    * division chain are IEEE-identical; round(·, 0) at the 1e6 grain
    * absorbs the sum-order ulp. */
  def submixTemperatureOracleSql: String =
    """WITH c AS (
      |  SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY lang),
      |w AS (SELECT lang, n, pow(n, 0.5) AS wt FROM c),
      |f AS (SELECT lang,
      |  CAST(round(least(1.0, 250.0 * wt / (SELECT sum(wt) FROM w) / n)
      |       * 1000000, 0) AS BIGINT) AS thr FROM w)
      |SELECT d.doc_id, d.lang, d.source
      |FROM documents d JOIN f ON d.lang = f.lang
      |WHERE ((d.doc_id % 100003) * 1103515245 + 12345) % 1000000 < f.thr""".stripMargin

  /** Query-map entry: the document corpus shuffled and cut into
    * 512-row training shards. */
  def shardAssignDocuments(spark: SparkSession, dir: String): DataFrame =
    shardAssign(Tables.documents(spark, dir), "doc_id", shardSize = 512L)
      .select("doc_id", "source", "shard", "shard_pos")

  def shardAssignOracleSql: String =
    """WITH r AS (
      |  SELECT doc_id, source,
      |    ROW_NUMBER() OVER (ORDER BY
      |      ((doc_id % 100003) * 1103515245 + 12345) % 1000000,
      |      doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, source,
      |  CAST((rn - 1) // 512 AS BIGINT) AS shard,
      |  CAST((rn - 1) % 512 AS BIGINT) AS shard_pos
      |FROM r""".stripMargin

  /** Query-map entry: 20 deterministic sample documents per source. */
  def sampleKPerSource(spark: SparkSession, dir: String): DataFrame =
    sampleKPerGroup(Tables.documents(spark, dir), "source", "doc_id", 20)
      .select("doc_id", "source", "lang")

  def sampleKOracleSql: String =
    """WITH r AS (
      |  SELECT doc_id, source, lang,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY ((doc_id % 100003) * 1103515245 + 12345) % 1000000,
      |               doc_id) AS rn
      |  FROM documents)
      |SELECT doc_id, source, lang FROM r WHERE rn <= 20""".stripMargin

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
