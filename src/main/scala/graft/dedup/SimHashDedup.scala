package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** 64-bit SimHash fingerprinting + hamming-band near-dup detection.
  *
  * SimHash: each word token votes ±1 on each of 64 bit positions
  * according to its xxhash64 bits; the fingerprint sets bit i when the
  * aggregate vote is ≥ 0. Near-identical texts differ in a handful of
  * bits, so candidates are found by exact match on any of four 16-bit
  * bands (pigeonhole: hamming distance ≤ 3 guarantees at least one of 4
  * bands identical), then verified with `bit_count(a ^ b) ≤ 3`.
  *
  * The vote aggregation is the compiled [[graft.functions.SimHash64]] —
  * one O(|tokens|·64) loop per row, the pass that runs once per corpus
  * row at 100 TB; banding joins on 16-bit keys are uniform by
  * construction.
  */
object SimHashDedup {

  val HammingMax = 3
  val BandCount = 4 // pigeonhole: > HammingMax bands of 16 bits

  /** 64-bit SimHash of a whitespace-tokenized text column (compiled
    * expression over per-token xxhash64 values, registered on the active
    * session). */
  def simhash(text: Column): Column =
    graft.functions.Native.call("graft_simhash64",
      exprs => graft.functions.SimHash64(exprs.head),
      transform(split(text, "\\s+"), w => xxhash64(w)))

  /** (id, fingerprint) table — materialized once (EAGER localCheckpoint,
    * one job at construction) because the banding join and the final
    * output projection both read it. Checkpoint blocks are released by
    * the ContextCleaner when the plan is garbage collected — unlike the
    * old cache(), which pinned a fingerprint table per call until an
    * explicit unpersist no caller ever issued. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("__id"), simhash(col(textCol)).as("__fp")).localCheckpoint()

  /** Verified near-dup pairs: hamming(simhash_a, simhash_b) ≤ HammingMax. */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    nearDupPairsFromFp(fingerprints(docs, idCol, textCol))

  /** Pair generation over a precomputed (\_\_id, \_\_fp) table. */
  def nearDupPairsFromFp(fp: DataFrame): DataFrame = {
    // shiftright needs a literal amount, so the 4 bands unroll statically
    val bandCols = Seq.tabulate(BandCount) { j =>
      struct(lit(j).as("band_idx"),
        shiftright(col("__fp"), 16 * j).bitwiseAND(lit(0xFFFFL)).as("band_v"))
    }
    val exploded = fp.select(col("__id"), col("__fp"),
      explode(array(bandCols: _*)).as("__b"))
      .select(col("__id"), col("__fp"), col("__b.band_idx"), col("__b.band_v"))

    exploded.as("a").join(exploded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_v") === col("b.band_v") &&
          col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
        col("a.__fp").as("__fpa"), col("b.__fp").as("__fpb"))
      .distinct()
      .withColumn("hamming", bit_count(col("__fpa").bitwiseXOR(col("__fpb"))).cast("int"))
      .filter(col("hamming") <= HammingMax)
      .select("a_id", "b_id", "hamming")
  }

  // ---- query-map entry (#29, rows-gated; semantics asserted in ScalaTest) ----

  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val fp = fingerprints(docs, "doc_id", "text")
    val pairs = nearDupPairsFromFp(fp)
    MinHashLsh.assignReps(docs, "doc_id", pairs.select("a_id", "b_id"))
      .join(fp.select(col("__id").as("doc_id"), col("__fp").as("simhash")), "doc_id")
      .select("doc_id", "simhash", "rep_id", "is_dup")
  }
}
