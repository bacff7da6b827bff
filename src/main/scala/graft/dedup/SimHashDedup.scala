package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** 64-bit SimHash fingerprinting + Manku-style block-combination
  * candidate generation.
  *
  * SimHash: each word token votes ±1 on each of 64 bit positions
  * according to its xxhash64 bits; the fingerprint sets bit i when the
  * aggregate vote is ≥ 0. Near-identical texts differ in a handful of
  * bits. Candidates: the fingerprint splits into 6 blocks
  * (11/11/11/11/10/10 bits); ≤ HammingMax (3) differing bits touch at
  * most 3 blocks, so every true pair agrees ENTIRELY on some 3 of the 6
  * — one table per C(6,3) = 20 block combinations, keyed on the
  * xxhash64 of that combination's 3 block values, reaches every pair
  * (the Manku/Jain/Sarma WWW'07 table construction). Verification is
  * exact `bit_count(a ^ b) ≤ 3`.
  *
  * Why not 4 raw 16-bit bands (the round-≤9 scheme): a raw 16-bit band
  * key has a FIXED universe of 65,536 buckets, so bucket occupancy — and
  * the self-join's candidate count — grows quadratically with corpus
  * size. The combination keys carry ~32-33 bits of fingerprint (hashed
  * to 64), so buckets stay ~2^16× smaller and only near-agreeing
  * fingerprints collide. The cost is a 20× (vs 4×) explode of the
  * narrow DISTINCT-fingerprint table — linear, shuffle-friendly, and
  * the price of guaranteed recall at 1B+ docs. Exact duplicates
  * (identical fingerprints) are collapsed to one banding row per
  * fingerprint BEFORE the explode, so dup-cluster size never inflates
  * band buckets (see [[fpCandidatePairs]]).
  *
  * The vote aggregation is the compiled [[graft.functions.SimHash64]] —
  * one O(|tokens|·64) loop per row, the pass that runs once per corpus
  * row at 100 TB.
  */
object SimHashDedup {

  val HammingMax = 3
  val BlockCount = 6 // > HammingMax blocks → some (BlockCount−3)-subset agrees

  /** (offset, width) of the 6 fingerprint blocks: 4×11 + 2×10 = 64. */
  private val Blocks: Seq[(Int, Int)] =
    Seq((0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10))

  private def block(fp: Column, i: Int): Column = {
    val (off, w) = Blocks(i)
    shiftright(fp, off).bitwiseAND(lit((1L << w) - 1))
  }

  /** All 3-of-6 block index combinations — one candidate table each. */
  private val Combos: Seq[Seq[Int]] =
    (0 until BlockCount).combinations(BlockCount - HammingMax)
      .map(_.toSeq).toSeq

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

  /** CANDIDATE pairs at the FINGERPRINT level, banding over DISTINCT
    * fingerprints only: (\_\_fpa, \_\_fpb) with \_\_fpa < \_\_fpb that
    * share at least one 3-block combination key. This is the
    * exact-dup-collapse discipline: identical texts (common at corpus
    * scale — mirrors, reposts) all carry the SAME fingerprint, and
    * banding the raw (id, fp) table would re-discover every
    * within-cluster pair in all 20 band buckets — a 20·m²/2 blowup per
    * m-sized dup cluster inside single band buckets. Banding the
    * distinct-fp table instead keeps every bucket's occupancy bounded
    * by DISTINCT near-identical fingerprints, independent of how many
    * exact copies each has. */
  /** Explode a DISTINCT-fingerprint frame into its C(6,3)=20
    * combination-key band rows (`__k`); ride-along columns (e.g. the
    * cluster representative) are preserved, so callers that already
    * hold a per-fingerprint aggregate band it directly instead of
    * paying a second distinct shuffle. shiftright needs literal
    * amounts, so the 20 tables unroll statically. */
  def bandExplode(dfp: DataFrame): DataFrame = {
    val keyCols = Combos.zipWithIndex.map { case (c, idx) =>
      xxhash64(lit(idx) +: c.map(block(col("__fp"), _)): _*)
    }
    dfp.withColumn("__k", explode(array(keyCols: _*)))
  }

  def fpCandidatePairs(fp: DataFrame): DataFrame = {
    val exploded = bandExplode(fp.select("__fp").distinct())
    exploded.as("a").join(exploded.as("b"),
        col("a.__k") === col("b.__k") && col("a.__fp") < col("b.__fp"))
      .select(col("a.__fp").as("__fpa"), col("b.__fp").as("__fpb"))
      .distinct()
  }

  /** CANDIDATE id pairs (pre-verification, deduped): ids that share at
    * least one 3-block combination key. Exposed so specs can assert the
    * candidate volume the banding admits, separately from recall.
    * Generated via [[fpCandidatePairs]] + member expansion: the band
    * JOIN never sees duplicate fingerprints; within-identical-fp pairs
    * (candidates by definition — they agree on every band) are emitted
    * directly once, not 20× through band buckets. Pair OUTPUT for an
    * m-sized identical-fp cluster is still m(m−1)/2 — intrinsic to the
    * pair contract; the gated component path ([[dedupSimhash]]) avoids
    * even that via linear member→representative edges. */
  def candidatePairs(fp: DataFrame): DataFrame = {
    val cross = fpCandidatePairs(fp)
      .join(fp.select(col("__fp").as("__fpa"), col("__id").as("__ida")), "__fpa")
      .join(fp.select(col("__fp").as("__fpb"), col("__id").as("__idb")), "__fpb")
      .select(
        least(col("__ida"), col("__idb")).as("a_id"),
        greatest(col("__ida"), col("__idb")).as("b_id"),
        // fps ride along for verification; hamming is symmetric so the
        // id swap needn't reorder them
        col("__fpa"), col("__fpb"))
    val within = fp.as("a").join(fp.as("b"),
        col("a.__fp") === col("b.__fp") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"),
        col("a.__fp").as("__fpa"), col("b.__fp").as("__fpb"))
    cross.unionByName(within)
  }

  /** Pair generation over a precomputed (\_\_id, \_\_fp) table. */
  def nearDupPairsFromFp(fp: DataFrame): DataFrame =
    candidatePairs(fp)
      .withColumn("hamming", bit_count(col("__fpa").bitwiseXOR(col("__fpb"))).cast("int"))
      .filter(col("hamming") <= HammingMax)
      .select("a_id", "b_id", "hamming")

  // ---- query-map entry (#29, rows-gated; semantics asserted in ScalaTest) ----

  /** Per-doc near-dup components. The edge set is LINEAR in the corpus:
    * member→fp-representative edges (hamming 0 by construction) plus
    * verified representative↔representative edges from the distinct-fp
    * banding — transitively identical components to the full pair
    * graph (every full-graph edge a–b is covered by a–repA–repB–b),
    * with no quadratic within-cluster pair expansion anywhere. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    components(Tables.documents(spark, dir), "doc_id", "text")

  /** The same component assignment over an arbitrary corpus frame. */
  def components(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol)
    val reps = fp.groupBy("__fp").agg(min("__id").as("__rep")).localCheckpoint()
    val memberEdges = fp.join(reps, "__fp")
      .filter(col("__id") =!= col("__rep"))
      .select(col("__rep").as("a_id"), col("__id").as("b_id"))
    // band the reps frame DIRECTLY: it is already the distinct-fp
    // aggregate, so the banding shares its shuffle instead of paying a
    // second distinct, and the band rows carry __rep — no join back
    val banded = bandExplode(reps)
    val repEdges = banded.as("a").join(banded.as("b"),
        col("a.__k") === col("b.__k") && col("a.__fp") < col("b.__fp"))
      .filter(bit_count(col("a.__fp").bitwiseXOR(col("b.__fp"))) <= HammingMax)
      .select(col("a.__rep").as("a_id"), col("b.__rep").as("b_id"))
      .distinct()
    MinHashLsh.assignReps(docs, idCol, memberEdges.unionByName(repEdges))
      .join(fp.select(col("__id").as(idCol), col("__fp").as("simhash")), idCol)
      .select(idCol, "simhash", "rep_id", "is_dup")
  }
}
