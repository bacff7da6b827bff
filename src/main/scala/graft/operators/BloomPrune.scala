package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter
import graft.Tables
import graft.functions.Native

/** Explicit Bloom-filter semi-join pruning for multi-stage pipelines.
  *
  * AQE injects runtime bloom filters inside ONE query's plan, but a
  * pipeline that materializes intermediate results (medallion tiers,
  * staged ETL like the reference's bronze→silver→gold flow) loses that:
  * each stage re-scans the full fact side. This operator makes the
  * pruning explicit and reusable: build a Bloom filter over the dim
  * keys once (`BloomFilterAggregate` over `xxhash64` — the same native
  * expressions AQE's runtime filter injection uses; a distributed
  * aggregate, driver holds only the final bit array), drop ~all
  * non-matching fact rows map-side BEFORE the shuffle via the codegen'd
  * `BloomFilterMightContain` probe, then run the exact semi join on the
  * survivors to remove false positives.
  *
  * Because a Bloom filter has NO false negatives and the residual semi
  * join removes every false positive, the result is bit-identical to
  * the plain semi join — which is exactly what the driver gate checks
  * (the oracle is the direct EXISTS query). The win at 100 TB: the
  * shuffle moves fpp·|fact| + |matches| rows instead of |fact|.
  *
  * Reference anchor: merge_generator.py's matched-key classification
  * and every dim-filtered fact extract in the DataBricks notebooks
  * (e.g. AIO_delta_table_generator.py fact loads keyed by dim rows).
  */
object BloomPrune {

  /** `fact` rows whose `factKey` appears in `dim`'s `dimKey` — the plain
    * semi join, but with a broadcast Bloom pre-filter so the shuffle
    * only carries probable matches. `expectedItems` sizes the filter;
    * pass the dim's (approximate) key count. */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
               dimKey: String, expectedItems: Long,
               fpp: Double = 0.01): DataFrame = {
    // Build the filter with the same codegen'd expressions AQE's runtime
    // filter injection uses (BloomFilterAggregate over xxhash64 of the
    // key): a distributed partial-merge aggregate whose payload is the
    // fixed-size bit array, never the key set. The one-row result is a
    // bounded driver read (like every scaling-stats collect here).
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val bloomBytes = dim.filter(col(dimKey).isNotNull)
      .select(Native.call("graft_bloom_agg",
        es => new BloomFilterAggregate(es(0), es(1), es(2)),
        xxhash64(col(dimKey).cast("long")), lit(expectedItems), lit(numBits)
      ).as("bf"))
      .head().getAs[Array[Byte]](0)
    // Probe with BloomFilterMightContain — a native expression, so the
    // whole pre-filter stays inside WholeStageCodegen (the scala UDF it
    // replaces broke codegen on the full fact scan). The filter bytes
    // ride as a foldable binary literal (BloomFilterMightContain requires
    // a constant/scalar-subquery filter side); null keys can never
    // satisfy the equi semi join, so dropping them is semantics-preserving.
    val pruned = fact.filter(col(factKey).isNotNull &&
      Native.call("graft_might_contain",
        es => BloomFilterMightContain(es(0), es(1)),
        lit(bloomBytes), xxhash64(col(factKey).cast("long"))))
    val keys = dim.select(col(dimKey).as("__k")).distinct()
    pruned.join(keys, pruned(factKey) === keys("__k"), "left_semi")
  }

  // ---- query-map entry (hash-gated by degeneracy: bloom FN-free +
  //      residual semi join ⇒ identical to the direct semi join) ----

  def bloomPruneLineitem(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    val li = Tables.lineitem(spark, dir)
    semiJoin(li, urgent, "l_orderkey", "o_orderkey",
      expectedItems = 100000L)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("price_cents"))
  }

  def oracleSql: String =
    """SELECT l.l_orderkey, l.l_linenumber,
      |  CAST(round(l.l_extendedprice*100, 0) AS BIGINT) AS price_cents
      |FROM lineitem l
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_orderkey = l.l_orderkey
      |    AND o.o_orderpriority = '1-URGENT')""".stripMargin
}
