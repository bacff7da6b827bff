package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Hot-key salted equi-join — the manual skew remedy for when AQE's
  * skew-join splitting can't help (it only splits SORT-MERGE partitions
  * AFTER a shuffle has already funneled a hot key into one task, and it
  * cannot split a hot BUILD side). Classic shape, same family as
  * [[SaltedCumSum]]'s salt→rollup aggregation:
  *
  *   - probe side: rows of a hot key get `salt = portableHash(row) % R`,
  *     spreading the key over R reducer partitions; cold keys salt 0;
  *   - build side: hot-key rows EXPLODE into all R salts (bounded
  *     replication: R copies of only the hot rows), cold rows ride
  *     along with salt 0;
  *   - equi-join on (key, salt).
  *
  * The result is row-identical to the plain join — replication on one
  * side is keyed by the same salt partition function as the spread on
  * the other, so every original pair meets exactly once. That identity
  * IS the driver gate (the oracle is the direct join). The spec also
  * checks the salted plan's max task input is bounded.
  *
  * Reference anchor: the reference's fact tables join dims on
  * device/SKU keys with heavy popularity skew
  * (merge_generator.py / AIO_delta_table_generator.py joins); at 100 TB
  * one hot SKU is the difference between a 10-minute and a 10-hour
  * stage.
  */
object SkewJoin {

  /** Inner equi-join of `left` (large, skewed) with `right` on
    * `leftKey = rightKey`, salting the listed hot keys over R partitions.
    * `saltSource` must be a deterministic left-side column (a row id) so
    * the gate hashes; any uniform-ish integer works. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
                 rightKey: String, hotKeys: Seq[Long], r: Int,
                 saltSource: String): DataFrame = {
    require(r >= 2, "salt fan-out must be >= 2")
    val lHot = col(leftKey).isInCollection(hotKeys)
    val l = left.withColumn("__salt",
      when(lHot, pmod(col(saltSource), lit(r)).cast("int"))
        .otherwise(lit(0)))
    val rHot = col(rightKey).isInCollection(hotKeys)
    val rr = right.withColumn("__salt",
      explode(when(rHot, sequence(lit(0), lit(r - 1)))
        .otherwise(array(lit(0)))))
    l.join(rr, l(leftKey) === rr(rightKey) && l("__salt") === rr("__salt"))
      .drop("__salt")
  }

  // ---- query-map entry (hash-gated by identity with the plain join) ----

  /** Lineitem ⋈ orders with the most-ordered keys declared hot. The hot
    * list is FIXED (the first 8 order keys — the generator's low keys
    * carry the most lineitems) so the query is deterministic; a real
    * deployment feeds it from a frequency sketch ([[FreqSketch]]). */
  def skewJoinLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderpriority")
    saltedJoin(li, ord, "l_orderkey", "o_orderkey",
      hotKeys = (0L to 7L), r = 8, saltSource = "l_partkey")
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderpriority"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("price_cents"))
  }

  def oracleSql: String =
    """SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority,
      |  CAST(round(l.l_extendedprice*100, 0) AS BIGINT) AS price_cents
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""".stripMargin
}
