package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Snapshot diff / change-data classification: compare two snapshots of a
  * keyed table and classify every key as insert / delete / update /
  * unchanged, with old and new values side by side — the standalone CDC
  * form of the reference's merge classifier
  * (/root/reference/DataEngineering/DataBricks/merge_generator.py:
  * matched/not-matched detection drives its MERGE branches; here the
  * classification IS the product, feeding downstream incremental loads).
  *
  * Scale stance: one full-outer shuffle join on the key — the minimal
  * shape for a two-sided diff; AQE handles skewed keys. Value comparison
  * is null-safe (`<=>`) so NULL→value and value→NULL transitions classify
  * as updates, not false "unchanged". Keys are assumed non-null (a null
  * key has no identity to diff on).
  */
object SnapshotDiff {

  /** @return one row per key present in either snapshot:
    *         keys ++ change_type ++ (old_c, new_c per compare column). */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("__o", lit(1)).alias("o")
    val n = newDf.select((keys ++ compareCols).map(col): _*)
      .withColumn("__n", lit(1)).alias("n")
    val cond = keys.map(k => col(s"o.$k") === col(s"n.$k")).reduce(_ && _)
    val changed = compareCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    val changeType = when(col("o.__o").isNull, lit("insert"))
      .when(col("n.__n").isNull, lit("delete"))
      .when(changed, lit("update"))
      .otherwise(lit("unchanged"))
    o.join(n, cond, "full_outer").select(
      keys.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k)) ++
        Seq(changeType.as("change_type")) ++
        compareCols.flatMap(c => Seq(
          col(s"o.$c").as(s"old_$c"), col(s"n.$c").as(s"new_$c"))): _*)
  }

  // ---- query-map entry (hash-gated) ----

  /** Deterministic demo diff over orders: the "old" snapshot misses
    * keys %10==3 (→ inserts), the "new" one misses %10==6 (→ deletes),
    * %7==0 rows get a price bump and %13==0 a synthetic priority
    * (→ updates); everything else is unchanged. */
  def snapshotDiffOrders(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
    val oldSnap = orders.filter(col("o_orderkey") % 10 =!= 3)
    val newSnap = orders.filter(col("o_orderkey") % 10 =!= 6)
      .withColumn("o_totalprice", col("o_totalprice") +
        when(col("o_orderkey") % 7 === 0, lit(10.0)).otherwise(lit(0.0)))
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 13 === 0, lit("9-SYNTH"))
          .otherwise(col("o_orderpriority")))
    diff(oldSnap, newSnap, Seq("o_orderkey"),
      Seq("o_totalprice", "o_orderpriority"))
      .select(col("o_orderkey"), col("change_type"),
        round(col("old_o_totalprice"), 2).as("old_o_totalprice"),
        round(col("new_o_totalprice"), 2).as("new_o_totalprice"),
        col("old_o_orderpriority"), col("new_o_orderpriority"))
  }

  def oracleSql: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
      |  WHERE o_orderkey % 10 <> 3),
      |n AS (
      |  SELECT o_orderkey,
      |    o_totalprice + (CASE WHEN o_orderkey % 7 = 0 THEN 10.0 ELSE 0.0 END)
      |      AS o_totalprice,
      |    CASE WHEN o_orderkey % 13 = 0 THEN '9-SYNTH' ELSE o_orderpriority END
      |      AS o_orderpriority
      |  FROM orders WHERE o_orderkey % 10 <> 6)
      |SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
      |  CASE WHEN o.o_orderkey IS NULL THEN 'insert'
      |       WHEN n.o_orderkey IS NULL THEN 'delete'
      |       WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
      |         OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
      |         THEN 'update'
      |       ELSE 'unchanged' END AS change_type,
      |  round(o.o_totalprice, 2) AS old_o_totalprice,
      |  round(n.o_totalprice, 2) AS new_o_totalprice,
      |  o.o_orderpriority AS old_o_orderpriority,
      |  n.o_orderpriority AS new_o_orderpriority
      |FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey""".stripMargin
}
