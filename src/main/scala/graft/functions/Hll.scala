package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dense-phase HyperLogLog with BOTH engines computing identical
  * registers — the cardinality-sketch counterpart of
  * [[DistinctSketch]]'s exact-under-cap sparse phase (together they are
  * the sparse→dense promotion of HLL++/Theta): 64 max-rank registers
  * from an affine hash mod the Mersenne prime 2⁶¹−1, harmonic-mean
  * estimate with linear-counting small-range correction.
  *
  * Everything non-algebraic is a PRECOMPUTED Scala integer table
  * embedded as the same literals in BOTH engines (the ndcg_eval
  * discount-table discipline): rank-of-lowest-set-bit via a 55-row
  * (2ᵉ, e+1) lookup on w & −w, 2^−register nanos via literal powers,
  * α₆₄ as micros, and m·ln(m/V) linear-counting values as a 64-row
  * table — no libm inside either engine, so the sketch state AND the
  * estimate hash-match exactly. One aggregate over the fact (map-side
  * partial max per register), then all arithmetic on the 64-row
  * register spine: the 100 TB cost is the scan.
  *
  * The hash is two affine-mod-prime rounds with xorshift mixing
  * between them (plain affine hashes have structured trailing-zero
  * geometry that wrecks HLL ranks on sequential keys — measured, then
  * fixed); constants validated to ±2σ estimate error across 1e2–1.5e5
  * sequential and strided key sets. Adversarial inputs would want a
  * cryptographic mix, declared.
  */
object Hll {
  val M = 64 // registers; bucket = h mod 64, w = h div 64 (55 bits)
  val P = 2305843009213693951L // 2^61 − 1
  val A = 2175609328894163535L
  val B = 800139658358739743L
  val A2 = 2237415465796677383L
  /** α₆₄ = 0.7213/(1 + 1.079/64) in truncating micros. */
  val AlphaMicro: Long = math.round(1e6 * 0.7213 / (1 + 1.079 / M))
  /** (2ᵉ, e+1): rank = table(w & −w); w = 0 → max rank 56. */
  val RankTable: Seq[(Long, Long)] = (0 to 54).map(e => (1L << e, e + 1L))
  val MaxRank = 56L
  /** v → round(1e6·m·ln(m/v)): linear counting, exact by table. */
  val LinearCountMicro: Seq[(Long, Long)] =
    (1 to M).map(v => (v.toLong, math.round(1e6 * M * math.log(M.toDouble / v))))
  /** r → 1e9 div 2^r (truncating: r ≥ 30 → 0 exactly like the oracle). */
  val InvPowNanos: Seq[(Long, Long)] =
    (0L to MaxRank).map(r => (r, if (r < 30) 1000000000L >> r else 0L))

  /** 64 register rows (bucket, register) each carrying the global
    * estimate columns (n_zero, sum_inv_nanos, raw_est_micro,
    * est_micro) — the mergeable sketch state plus its readout. */
  def sketch(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the codegen'd [[MixMod61]] pipeline (two affine-mod-P rounds with
    // xorshift mixing — plain affine trailing-zero geometry is too
    // structured for HLL ranks); bit-identical to the oracle's
    // HUGEINT chain for the non-negative keys here
    val hashed = df.select(
        Native.call("graft_mix_mod61",
          exprs => MixMod61(exprs.head), col(keyCol).cast("long")).as("h"))
      .select(expr(s"h % $M").as("bucket"), expr(s"h div $M").as("w"))
    val ranks = RankTable.toDF("lowbit", "rank")
    val withRank = hashed
      .withColumn("lowbit", expr("w & -w"))
      .join(broadcast(ranks), Seq("lowbit"), "left")
      .select(col("bucket"), coalesce(col("rank"), lit(MaxRank)).as("rank"))
    val spine = (0 until M).map(_.toLong).toDF("bucket")
    val regs = spine.join(
        withRank.groupBy("bucket").agg(max(col("rank")).as("r")),
        Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("r"), lit(0L)).as("register"))
    val invs = InvPowNanos.toDF("register", "inv_nanos")
    val lc = LinearCountMicro.toDF("v", "lc_micro")
    val stats = regs.join(broadcast(invs), "register")
      .agg(
        sum(when(col("register") === 0L, 1L).otherwise(0L)).as("n_zero"),
        sum(col("inv_nanos")).as("sum_inv_nanos"))
      .withColumn("raw_est_micro",
        expr(s"(${AlphaMicro}L * ${M.toLong * M}L * 1000000000L) div sum_inv_nanos"))
      .join(broadcast(lc), col("n_zero") === col("v"), "left")
      .select(col("n_zero"), col("sum_inv_nanos"), col("raw_est_micro"),
        // small-range: V > 0 and raw ≤ 2.5m → linear counting
        when(col("n_zero") > 0L &&
             col("raw_est_micro") <= lit(5L * M / 2 * 1000000L),
          coalesce(col("lc_micro"), lit(0L)))
          .otherwise(col("raw_est_micro")).as("est_micro"))
    regs.crossJoin(broadcast(stats))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: distinct order-placing customers. */
  def hllOrders(spark: SparkSession, dir: String): DataFrame =
    sketch(Tables.orders(spark, dir).select(col("o_custkey")), "o_custkey")

  /** GROUPED portable-HLL estimate — one row per group: (group,
    * n_rows, n_zero, sum_inv_nanos, raw_est_micro, est_micro). The
    * same engine-identical register pipeline as [[sketch]], pooled per
    * group WITHOUT a register spine: a missing bucket is a zero
    * register, so n_zero = m − |present buckets| and its inv-power
    * mass is (m − present)·10⁹ — two aggregates (per-(group, bucket)
    * max-rank with map-side partial max, then the per-group rollup)
    * plus the broadcast lookup joins. At 100 TB the shuffle carries
    * ≤ m rows per group, a true mergeable sketch. */
  def sketchBy(df: DataFrame, grpCol: String, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val hashed = df.select(col(grpCol).as("__g"),
        Native.call("graft_mix_mod61",
          exprs => MixMod61(exprs.head), col(keyCol).cast("long")).as("h"))
      .select(col("__g"), expr(s"h % $M").as("bucket"),
        expr(s"h div $M").as("w"))
    val ranks = RankTable.toDF("lowbit", "rank")
    val regs = hashed
      .withColumn("lowbit", expr("w & -w"))
      .join(broadcast(ranks), Seq("lowbit"), "left")
      .select(col("__g"), col("bucket"),
        coalesce(col("rank"), lit(MaxRank)).as("rank"))
      .groupBy("__g", "bucket").agg(max(col("rank")).as("register"))
    val invs = InvPowNanos.toDF("register", "inv_nanos")
    val lc = LinearCountMicro.toDF("v", "lc_micro")
    val counts = df.groupBy(col(grpCol).as("__g"))
      .agg(count(lit(1)).as("n_rows"))
    regs.join(broadcast(invs), "register")
      .groupBy("__g")
      .agg(count(lit(1)).as("__present"),
        sum(col("inv_nanos")).as("__s"))
      .withColumn("n_zero", lit(M.toLong) - col("__present"))
      .withColumn("sum_inv_nanos",
        col("__s") + col("n_zero") * lit(1000000000L))
      .withColumn("raw_est_micro",
        expr(s"(${AlphaMicro}L * ${M.toLong * M}L * 1000000000L) div sum_inv_nanos"))
      .join(broadcast(lc), col("n_zero") === col("v"), "left")
      .join(counts, "__g")
      .select(col("__g").as(grpCol), col("n_rows"), col("n_zero"),
        col("sum_inv_nanos"), col("raw_est_micro"),
        when(col("n_zero") > 0L &&
             col("raw_est_micro") <= lit(5L * M / 2 * 1000000L),
          coalesce(col("lc_micro"), lit(0L)))
          .otherwise(col("raw_est_micro")).as("est_micro"))
  }

  /** The portable re-point of the `sketch_distinct_events` gate:
    * per-event-type approximate distinct users from the
    * engine-identical dense HLL (the Spark-native
    * `approx_count_distinct` variant stays available via
    * [[graft.operators.Sketches.approxDistinct]], spec-gated — its
    * sketch internals are engine-specific and can never hash-match an
    * oracle). */
  def hllDistinctEventTypes(spark: SparkSession, dir: String): DataFrame =
    sketchBy(Tables.events(spark, dir).select("event_type", "user_id"),
      "event_type", "user_id")

  private def valuesList(t: Seq[(Long, Long)]): String =
    t.map { case (a, b) => s"($a, $b)" }.mkString(", ")

  def oracleSql: String =
    s"""WITH h1s AS (
      |  SELECT CAST((CAST($A AS HUGEINT) * o_custkey + $B) % $P
      |    AS BIGINT) AS h1
      |  FROM orders
      |), h2s AS (
      |  SELECT CAST((CAST($A2 AS HUGEINT) * xor(h1, h1 >> 30)) % $P
      |    AS BIGINT) AS h2
      |  FROM h1s
      |), hashed AS (
      |  SELECT xor(h2, h2 >> 27) AS h FROM h2s
      |), parts AS (
      |  SELECT h % $M AS bucket, h // $M AS w FROM hashed
      |), rt(lowbit, rank) AS (VALUES ${valuesList(RankTable)}),
      |ranked AS (
      |  SELECT p.bucket, coalesce(rt.rank, $MaxRank) AS rank
      |  FROM parts p LEFT JOIN rt ON (p.w & -p.w) = rt.lowbit
      |), spine AS (
      |  SELECT range AS bucket FROM range(0, $M)
      |), regs AS (
      |  SELECT s.bucket, coalesce(max(r.rank), 0) AS register
      |  FROM spine s LEFT JOIN ranked r ON s.bucket = r.bucket
      |  GROUP BY 1
      |), ip(register, inv_nanos) AS (VALUES ${valuesList(InvPowNanos)}),
      |lc(v, lc_micro) AS (VALUES ${valuesList(LinearCountMicro)}),
      |stats AS (
      |  SELECT CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
      |    CAST(sum(ip.inv_nanos) AS BIGINT) AS sum_inv_nanos
      |  FROM regs JOIN ip USING (register)
      |), est AS (
      |  SELECT n_zero, sum_inv_nanos,
      |    CAST((CAST($AlphaMicro AS HUGEINT) * ${M.toLong * M}
      |      * 1000000000) // sum_inv_nanos AS BIGINT) AS raw_est_micro
      |  FROM stats
      |), final_est AS (
      |  SELECT e.n_zero, e.sum_inv_nanos, e.raw_est_micro,
      |    CASE WHEN e.n_zero > 0 AND e.raw_est_micro <= ${5L * M / 2 * 1000000L}
      |      THEN coalesce(lc.lc_micro, 0)
      |      ELSE e.raw_est_micro END AS est_micro
      |  FROM est e LEFT JOIN lc ON e.n_zero = lc.v
      |)
      |SELECT r.bucket, r.register, f.n_zero, f.sum_inv_nanos,
      |  f.raw_est_micro, f.est_micro
      |FROM regs r CROSS JOIN final_est f""".stripMargin

  def groupedOracleSql: String =
    s"""WITH h1s AS (
      |  SELECT event_type, CAST((CAST($A AS HUGEINT) * user_id + $B) % $P
      |    AS BIGINT) AS h1
      |  FROM events
      |), h2s AS (
      |  SELECT event_type, CAST((CAST($A2 AS HUGEINT) * xor(h1, h1 >> 30)) % $P
      |    AS BIGINT) AS h2
      |  FROM h1s
      |), hashed AS (
      |  SELECT event_type, xor(h2, h2 >> 27) AS h FROM h2s
      |), parts AS (
      |  SELECT event_type, h % $M AS bucket, h // $M AS w FROM hashed
      |), rt(lowbit, rank) AS (VALUES ${valuesList(RankTable)}),
      |ranked AS (
      |  SELECT p.event_type, p.bucket, coalesce(rt.rank, $MaxRank) AS rank
      |  FROM parts p LEFT JOIN rt ON (p.w & -p.w) = rt.lowbit
      |), regs AS (
      |  SELECT event_type, bucket, max(rank) AS register
      |  FROM ranked GROUP BY 1, 2
      |), ip(register, inv_nanos) AS (VALUES ${valuesList(InvPowNanos)}),
      |lc(v, lc_micro) AS (VALUES ${valuesList(LinearCountMicro)}),
      |stats AS (
      |  SELECT event_type,
      |    $M - CAST(count(*) AS BIGINT) AS n_zero,
      |    CAST(sum(ip.inv_nanos) AS BIGINT)
      |      + ($M - CAST(count(*) AS BIGINT)) * 1000000000 AS sum_inv_nanos
      |  FROM regs JOIN ip USING (register) GROUP BY event_type
      |), est AS (
      |  SELECT event_type, n_zero, sum_inv_nanos,
      |    CAST((CAST($AlphaMicro AS HUGEINT) * ${M.toLong * M}
      |      * 1000000000) // sum_inv_nanos AS BIGINT) AS raw_est_micro
      |  FROM stats
      |), cnts AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows
      |  FROM events GROUP BY event_type
      |)
      |SELECT e.event_type, c.n_rows, e.n_zero,
      |  CAST(e.sum_inv_nanos AS BIGINT) AS sum_inv_nanos,
      |  e.raw_est_micro,
      |  CASE WHEN e.n_zero > 0 AND e.raw_est_micro <= ${5L * M / 2 * 1000000L}
      |    THEN coalesce(lc.lc_micro, 0)
      |    ELSE e.raw_est_micro END AS est_micro
      |FROM est e
      |LEFT JOIN lc ON e.n_zero = lc.v
      |JOIN cnts c USING (event_type)""".stripMargin
}
