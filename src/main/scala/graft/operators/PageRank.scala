package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fixed-iteration PageRank in EXACT integer-micros arithmetic — graph
  * centrality over an edge list, the iterative sibling of
  * [[Graph.graphComponents]]'s pointer-jumping (both are the batch-graph
  * analyses a lakehouse runs over entity-link tables like the
  * reference's star lineage,
  * /root/reference/DataEngineering/DataBricks/AIO_delta_table_generator.py).
  *
  * Arithmetic contract: ranks are BIGINT micros. One iteration is
  * `r'(v) = 150000 + (850000 · Σ_{u→v} (r(u) DIV outdeg(u))) DIV 1000000`
  * — every step integer division on non-negative values, so Spark's
  * `DIV` and DuckDB's `//` agree bit-for-bit and the hash gate holds for
  * ANY iteration count with no float tolerance. (The cost: dangling-node
  * mass is dropped and DIV truncates — standard simplifications; rank
  * ORDER is what downstream consumers use.)
  *
  * Scale shape: per iteration, one shuffle joining edges⋈ranks on the
  * source key and one aggregate on the destination key — the classic
  * Pregel envelope, linear in |E| per iteration with uniform hash keys.
  * Out-degrees are computed once. Rank frames stay O(|V|). For deep
  * iteration counts, `localCheckpoint` every ~5 rounds caps lineage
  * growth (the gated 3-iteration instance doesn't need it).
  */
object PageRank {

  private val DampMicros = 850000L
  private val BaseMicros = 150000L

  /** (node, rank_micros) after `iters` iterations from a uniform
    * 1_000_000-micros start. `edges` must have `src`/`dst` columns;
    * parallel edges are counted once (deduped). Callers that already
    * guarantee distinct edges pass `edgesDistinct = true` to skip the
    * dedup — on a fact-derived edge list that distinct is the single
    * most memory-hungry aggregate of the whole job. */
  def ranks(edges: DataFrame, iters: Int,
            edgesDistinct: Boolean = false): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    // materialize the loop invariants ONCE: every iteration's plan (and
    // the final action) would otherwise replay the caller's edge
    // derivation — typically a join — once per occurrence. localCheckpoint
    // blocks are freed by the ContextCleaner when the plans are GC'd.
    val eRaw = edges.select(col("src"), col("dst"))
    val e = (if (edgesDistinct) eRaw else eRaw.distinct()).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    // out-degree is loop-INVARIANT: bake it into the edge table once so
    // each iteration pays ONE join (edges⋈ranks), not two — the window
    // form (count over src partition) keeps it a single pass over e
    val eDeg = e.withColumn("__outdeg",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("src")))
      .localCheckpoint()
    var r = nodes.withColumn("rank_micros", lit(1000000L))
    for (i <- 1 to iters) {
      val contrib = eDeg
        .join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank_micros DIV __outdeg").as("__c"))
        .groupBy("node").agg(sum("__c").as("__in"))
      // (850000·s) DIV 1e6 decomposed as 850000·(s DIV 1e6) +
      // (850000·(s MOD 1e6)) DIV 1e6 — identical for s ≥ 0 (s is a sum
      // of DIV-truncated non-negative contributions), but the largest
      // intermediate is now max(850000·(s DIV 1e6), ~8.5e11) instead of
      // 850000·s, so ANSI BIGINT holds up to s ≈ 1.08e19 of incoming
      // micros-mass (the representable limit) rather than throwing at a
      // ~1e7-node hub. DuckDB's HUGEINT-promoted form agrees exactly.
      r = nodes.join(contrib, Seq("node"), "left")
        .withColumn("rank_micros",
          expr(s"${BaseMicros}L + $DampMicros * (coalesce(__in, 0L) DIV 1000000L)" +
            s" + ($DampMicros * (coalesce(__in, 0L) % 1000000L)) DIV 1000000L"))
        .drop("__in")
      // cap lineage on deep runs; no-op cost for the shallow gated case
      if (i % 5 == 0 && i < iters) r = r.localCheckpoint(eager = true)
    }
    r
  }

  // ---- query-map entry (hash-gated vs an unrolled DuckDB CTE) ----

  /** Gated instance: the customer↔supplier trade graph (an edge per
    * distinct trading pair from orders⋈lineitem, BOTH directions so rank
    * circulates), 3 iterations. The output keeps the prefixed-string
    * node ids (the two entity spaces can't collide), but the ITERATION
    * runs on parity-encoded LONG keys (2·custkey / 2·suppkey+1): at the
    * 100× replica the string-keyed frames (~11M nodes × 3 joins ×
    * 32 concurrent tasks) blew the default heap, while long keys join
    * radix-style, halve every shuffle row, and land the same hash gate
    * — the id-encoding move a 100 TB graph job makes on day one.
    *
    * Memory envelope (r18): the pair-build `distinct()` over the
    * FACT-sized join output was the one aggregate that still needed a
    * 32g driver at the 100× replica — its map-side partial hash tables
    * grow with the per-task distinct-pair count. Two-phase fix in the
    * harmonicCloseness discipline: the pair state bound is known in
    * advance (≤ fact rows, read from parquet footers via
    * [[graft.ParquetMeta.rowCount]] — metadata-only, no scan job), so above the
    * session partition count the join output is hash-repartitioned on
    * (c, s) to ~1M pairs/partition (cap 4096) BEFORE the distinct —
    * the repartition satisfies the aggregate's required distribution,
    * eliminating the unbounded partial phase; and `ranks` is told the
    * edges are already distinct (both directions are disjoint by
    * parity), removing the second fact-sized dedup entirely. At bench
    * SFs the threshold never engages, so the plan is unchanged. */
  def pagerankTrade(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    // footer-only row count (no scan job) — needed only to bound pairs
    val factRows = graft.ParquetMeta.rowCount(spark, s"$dir/lineitem.parquet")
    val sessionParts =
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val parts = math.max(sessionParts,
      math.min(4096L, factRows / 1000000L).toInt)
    val joined = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2L).as("c"),
        (col("l_suppkey") * 2L + 1L).as("s"))
    val pairs =
      (if (parts > sessionParts) joined.repartition(parts, col("c"), col("s"))
       else joined).distinct()
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionByName(pairs.select(col("s").as("src"), col("c").as("dst")))
    ranks(edges, iters = 3, edgesDistinct = true)
      .select(
        when(col("node") % 2 === 0, concat(lit("c"), shiftright(col("node"), 1)))
          .otherwise(concat(lit("s"), shiftright(col("node"), 1)))
          .as("node"),
        col("rank_micros"))
  }

  def oracleSql: String = {
    def step(prev: String, cur: String) =
      s"""$cur AS (
         |  SELECT n.node,
         |    150000 + (850000 * coalesce(sum($prev.r // d.outdeg), 0)) // 1000000 AS r
         |  FROM n
         |  LEFT JOIN e ON e.dst = n.node
         |  LEFT JOIN $prev ON $prev.node = e.src
         |  LEFT JOIN d ON d.src = e.src
         |  GROUP BY n.node
         |)""".stripMargin
    s"""WITH pairs AS (
       |  SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |), e AS (
       |  SELECT c AS src, s AS dst FROM pairs
       |  UNION
       |  SELECT s AS src, c AS dst FROM pairs
       |), n AS (
       |  SELECT src AS node FROM e UNION SELECT dst FROM e
       |), d AS (
       |  SELECT src, count(*) AS outdeg FROM e GROUP BY 1
       |), r0 AS (
       |  SELECT node, 1000000 AS r FROM n
       |),
       |${step("r0", "r1")},
       |${step("r1", "r2")},
       |${step("r2", "r3")}
       |SELECT node, CAST(r AS BIGINT) AS rank_micros FROM r3""".stripMargin
  }
}
