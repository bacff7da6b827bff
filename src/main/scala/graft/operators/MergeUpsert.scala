package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** MERGE/upsert changeset application — the DataFrame re-expression of the
  * reference's MERGE INTO generator
  * (/root/reference/DataEngineering/DataBricks/merge_generator.py:1-405):
  * dedup the changeset to the latest row per natural key, classify each
  * key as insert / changed / unchanged by comparing the tracked columns,
  * then emit the post-merge table — changed current rows expired
  * (current_version=0), their replacements and brand-new keys inserted as
  * current_version=1, untouched rows passed through.
  *
  * Scale shape: one window over the changeset (keyed by natural key —
  * changesets are incremental and small relative to the dim) and one
  * shuffle join target ⋈ changeset on the natural key. No broadcast hint:
  * dims range from tiny to fact-sized, so AQE picks broadcast only when
  * the changeset actually fits (the reference's data-skipping predicate
  * plays the same role of bounding the scanned side). Change detection is
  * a null-safe column comparison — the generator's `WHERE NOT (c.x = cs.x
  * AND ...)` block — built over the tracked columns only, mirroring its
  * housekeeping/identity exclusions.
  */
object MergeUpsert {

  /** Latest changeset row per natural key (merge_generator's dedup step). */
  def latestPerKey(changeset: DataFrame, naturalKey: Seq[String],
                   orderCol: String): DataFrame = {
    val w = Window.partitionBy(naturalKey.map(col): _*).orderBy(col(orderCol).desc)
    changeset.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn", orderCol)
  }

  /** Apply a changeset to a current-versioned target.
    *
    * @param target      current table; must carry `current_version` (1=live)
    * @param changeset   incoming rows (same business columns, no version col)
    * @param naturalKey  business key column(s)
    * @param orderCol    changeset sequencing column for latest-per-key dedup
    * @param compareCols columns whose change triggers expire+insert
    * @param dataSkipping when true (default), EAGERLY runs one bounded
    *                     Spark job during construction — a min/max agg
    *                     over the changeset key — to push the key range
    *                     into the target scan as literal PushedFilters
    *                     (merge_generator.py's explicit skipping clause).
    *                     Pass false to keep construction fully lazy (no
    *                     job, no data-dependent failure until an action).
    * @return post-merge rows: business cols + current_version + change_type
    *         in ('insert','update_new','expired','unchanged')
    */
  def apply(target: DataFrame, changeset: DataFrame, naturalKey: Seq[String],
            orderCol: String, compareCols: Seq[String],
            dataSkipping: Boolean = true): DataFrame = {
    val latest = latestPerKey(changeset, naturalKey, orderCol)
    val dataCols = latest.columns.filterNot(naturalKey.contains).toSeq
    val cs = latest.select(
      naturalKey.map(col) ++
        dataCols.map(c => col(c).as(s"__cs_$c")) :+ lit(1).as("__in_cs"): _*)

    val live = target.filter(col("current_version") === 1)
    val dead = target.filter(col("current_version") =!= 1)
      .withColumn("change_type", lit("unchanged"))

    // data-skipping predicate (merge_generator.py's explicit min/max
    // bounds clause): target rows whose natural key falls outside the
    // changeset's key range can never match — route them around the join
    // entirely. Both range filters reach the parquet scan as
    // PushedFilters, so at 100 TB an incremental changeset touches only
    // the target files whose key stats overlap it. The bounds are taken
    // on the RAW changeset — latest-per-key dedup never changes the key
    // set, so this is a pushed-down scan-level min/max agg with no
    // window shuffle in front of it.
    val skipBounds: Option[(Any, Any)] =
      if (dataSkipping && naturalKey.size == 1) {
        val k = naturalKey.head
        val r = changeset.agg(min(col(k)), max(col(k))).head()
        if (r.isNullAt(0)) None else Some((r.get(0), r.get(1)))
      } else None
    val (inScope, outOfScope) = skipBounds match {
      case Some((lo, hi)) =>
        val k = col(naturalKey.head)
        (live.filter(k >= lit(lo) && k <= lit(hi)),
         live.filter(k < lit(lo) || k > lit(hi) || k.isNull))
      case None => (live, live.filter(lit(false)))
    }

    val joined = inScope.join(cs, naturalKey, "full_outer")
    val changed = compareCols
      .map(c => !(col(c) <=> col(s"__cs_$c"))) // null-safe: NOT (c.x = cs.x AND …)
      .reduce(_ || _)
    val inTarget = col("current_version").isNotNull
    val inCs = col("__in_cs").isNotNull

    // surviving old rows: unchanged keep version 1; changed get expired
    val oldRows = joined.filter(inTarget)
      .select(
        (naturalKey.map(col) ++ dataCols.map(col)) :+
          when(inCs && changed, lit(0)).otherwise(lit(1)).as("current_version") :+
          when(inCs && changed, lit("expired")).otherwise(lit("unchanged")).as("change_type"): _*)

    // new versions: changed keys (update_new) and brand-new keys (insert)
    val newRows = joined.filter(inCs && (!inTarget || changed))
      .select(
        (naturalKey.map(col) ++ dataCols.map(c => col(s"__cs_$c").as(c))) :+
          lit(1).as("current_version") :+
          when(inTarget, lit("update_new")).otherwise(lit("insert")).as("change_type"): _*)

    // out-of-bounds live rows pass through untouched, never joined
    val skipped = outOfScope.select(
      (naturalKey.map(col) ++ dataCols.map(col)) :+
        col("current_version") :+ lit("unchanged").as("change_type"): _*)

    dead.select(oldRows.columns.map(col): _*)
      .unionByName(oldRows).unionByName(newRows).unionByName(skipped)
  }

  /** MERGE with deletes — the full three-clause form of the reference's
    * generator (WHEN MATCHED AND del THEN DELETE / WHEN MATCHED THEN
    * UPDATE / WHEN NOT MATCHED THEN INSERT). `deleteCol` is a boolean on
    * the changeset; the latest row per key wins, so a delete followed by
    * a later re-insert of the same key is an update, not a delete.
    * Deletes are SOFT (current_version=0, change_type='deleted') — the
    * audit-preserving form; a delete for an absent key is a no-op.
    * Same scale shape as [[apply]]: one changeset window + one key join,
    * AQE free to broadcast the changeset side. */
  def applyWithDeletes(target: DataFrame, changeset: DataFrame,
                       naturalKey: Seq[String], orderCol: String,
                       compareCols: Seq[String], deleteCol: String): DataFrame = {
    val latest = latestPerKey(changeset, naturalKey, orderCol)
    val dataCols = latest.columns
      .filterNot(naturalKey.contains).filterNot(_ == deleteCol).toSeq
    val cs = latest.select(
      naturalKey.map(col) ++ dataCols.map(c => col(c).as(s"__cs_$c")) :+
        coalesce(col(deleteCol), lit(false)).as("__cs_del") :+
        lit(1).as("__in_cs"): _*)

    val live = target.filter(col("current_version") === 1)
    val dead = target.filter(col("current_version") =!= 1)
      .withColumn("change_type", lit("unchanged"))

    val joined = live.join(cs, naturalKey, "full_outer")
    val changed = compareCols
      .map(c => !(col(c) <=> col(s"__cs_$c")))
      .reduce(_ || _)
    val inTarget = col("current_version").isNotNull
    val inCs = col("__in_cs").isNotNull
    val del = inCs && col("__cs_del")

    // surviving target rows: deleted → tombstone; changed → expired
    val oldRows = joined.filter(inTarget)
      .select(
        (naturalKey.map(col) ++ dataCols.map(col)) :+
          when(del || (inCs && changed), lit(0)).otherwise(lit(1)).as("current_version") :+
          when(del, lit("deleted"))
            .when(inCs && changed, lit("expired"))
            .otherwise(lit("unchanged")).as("change_type"): _*)

    // replacements + true inserts; a delete row never spawns a new version
    val newRows = joined.filter(inCs && !col("__cs_del") && (!inTarget || changed))
      .select(
        (naturalKey.map(col) ++ dataCols.map(c => col(s"__cs_$c").as(c))) :+
          lit(1).as("current_version") :+
          when(inTarget, lit("update_new")).otherwise(lit("insert")).as("change_type"): _*)

    dead.select(oldRows.columns.map(col): _*)
      .unionByName(oldRows).unionByName(newRows)
  }

  /** MERGE with additive schema evolution — the batch twin of
    * `FileIngest.ingestEvolving` (the reference turns on
    * `mergeSchema`/addNewColumns for exactly this,
    * /root/reference/DataEngineering/DataBricks/spark_stream.py:13-17 ×
    * merge_generator.py): changeset columns absent from the target are
    * ADDED (existing rows null-backfilled), target columns absent from
    * the changeset ride along (changeset rows get null), and the new
    * columns join the change-detection compare automatically so a row
    * differing only in a new column still versions. Column REMOVAL is
    * not evolution — the surviving union of both schemas is always
    * emitted. */
  def applyEvolving(target: DataFrame, changeset: DataFrame,
                    naturalKey: Seq[String], orderCol: String,
                    compareCols: Seq[String]): DataFrame = {
    val tCols = target.columns.toSet
    val csCols = changeset.columns.toSet
    val added = changeset.columns
      .filterNot(c => tCols.contains(c) || c == orderCol).toSeq
    val carried = target.columns
      .filterNot(c => csCols.contains(c) || c == "current_version").toSeq
    val alignedTarget = added.foldLeft(target)((df, c) =>
      df.withColumn(c, lit(null).cast(changeset.schema(c).dataType)))
    val alignedCs = carried.foldLeft(changeset)((df, c) =>
      df.withColumn(c, lit(null).cast(target.schema(c).dataType)))
    apply(alignedTarget, alignedCs, naturalKey, orderCol,
      compareCols ++ added)
  }

  // ---- query-map entry (#9) ----

  /** Deterministic demo merge over customer: target = customer as a live
    * dim; changeset derived from it — custkey%10==0 updated (twice, with a
    * stale earlier row the dedup must drop), %10==1 no-op duplicates,
    * %10==2 re-keyed as brand-new inserts. */
  def mergeUpsertCustomer(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val target = c.withColumn("current_version", lit(1))
    val updatesStale = c.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") + 50, 2))
      .withColumn("change_seq", lit(1))
    val updates = c.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") + 100, 2))
      .withColumn("change_seq", lit(2))
    val noops = c.filter(col("c_custkey") % 10 === 1)
      .withColumn("change_seq", lit(1))
    val inserts = c.filter(col("c_custkey") % 10 === 2)
      .withColumn("c_custkey", col("c_custkey") + 1000000)
      .withColumn("change_seq", lit(1))
    val changeset = updatesStale.unionByName(updates)
      .unionByName(noops).unionByName(inserts)
    apply(target, changeset, Seq("c_custkey"), "change_seq",
      Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
  }

  /** Gated delete-merge demo: %10==0 updated, %10==3 deleted (with a
    * stale non-delete row the dedup must drop — delete wins by seq),
    * %10==5 delete of an ABSENT key (no-op), %10==1 no-op duplicates. */
  def mergeDeleteCustomer(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val target = c.withColumn("current_version", lit(1))
    val updates = c.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") + 100, 2))
      .withColumn("is_delete", lit(false)).withColumn("change_seq", lit(1))
    val delStale = c.filter(col("c_custkey") % 10 === 3)
      .withColumn("c_acctbal", round(col("c_acctbal") + 1, 2))
      .withColumn("is_delete", lit(false)).withColumn("change_seq", lit(1))
    val deletes = c.filter(col("c_custkey") % 10 === 3)
      .withColumn("is_delete", lit(true)).withColumn("change_seq", lit(2))
    val ghostDel = c.filter(col("c_custkey") % 10 === 5)
      .withColumn("c_custkey", col("c_custkey") + 2000000)
      .withColumn("is_delete", lit(true)).withColumn("change_seq", lit(1))
    val noops = c.filter(col("c_custkey") % 10 === 1)
      .withColumn("is_delete", lit(false)).withColumn("change_seq", lit(1))
    val changeset = updates.unionByName(delStale).unionByName(deletes)
      .unionByName(ghostDel).unionByName(noops)
    applyWithDeletes(target, changeset, Seq("c_custkey"), "change_seq",
      Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"), "is_delete")
  }

  def mergeDeleteOracleSql: String =
    """WITH cs_all AS (
      |  SELECT c_custkey, c_name, c_nationkey, round(c_acctbal + 100, 2) AS c_acctbal,
      |         c_mktsegment, false AS is_delete, 1 AS change_seq
      |  FROM customer WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, round(c_acctbal + 1, 2),
      |         c_mktsegment, false, 1 FROM customer WHERE c_custkey % 10 = 3
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
      |         c_mktsegment, true, 2 FROM customer WHERE c_custkey % 10 = 3
      |  UNION ALL
      |  SELECT c_custkey + 2000000, c_name, c_nationkey, c_acctbal,
      |         c_mktsegment, true, 1 FROM customer WHERE c_custkey % 10 = 5
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
      |         c_mktsegment, false, 1 FROM customer WHERE c_custkey % 10 = 1
      |), cs AS (
      |  SELECT * EXCLUDE (change_seq, rn) FROM (
      |    SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY change_seq DESC) rn
      |    FROM cs_all) WHERE rn = 1
      |), j AS (
      |  SELECT t.c_custkey AS t_key, t.c_name AS t_name, t.c_nationkey AS t_nk,
      |         t.c_acctbal AS t_bal, t.c_mktsegment AS t_seg,
      |         cs.c_custkey AS cs_key, cs.c_name AS cs_name, cs.c_nationkey AS cs_nk,
      |         cs.c_acctbal AS cs_bal, cs.c_mktsegment AS cs_seg,
      |         coalesce(cs.is_delete, false) AS del,
      |         (t.c_custkey IS NOT NULL AND cs.c_custkey IS NOT NULL AND NOT
      |          (t.c_name IS NOT DISTINCT FROM cs.c_name AND
      |           t.c_nationkey IS NOT DISTINCT FROM cs.c_nationkey AND
      |           t.c_acctbal IS NOT DISTINCT FROM cs.c_acctbal AND
      |           t.c_mktsegment IS NOT DISTINCT FROM cs.c_mktsegment)) AS changed
      |  FROM customer t FULL OUTER JOIN cs ON t.c_custkey = cs.c_custkey
      |)
      |SELECT t_key AS c_custkey, t_name AS c_name, t_nk AS c_nationkey,
      |       t_bal AS c_acctbal, t_seg AS c_mktsegment,
      |       CASE WHEN (cs_key IS NOT NULL AND del) OR changed THEN 0 ELSE 1 END AS current_version,
      |       CASE WHEN cs_key IS NOT NULL AND del THEN 'deleted'
      |            WHEN changed THEN 'expired' ELSE 'unchanged' END AS change_type
      |FROM j WHERE t_key IS NOT NULL
      |UNION ALL
      |SELECT cs_key, cs_name, cs_nk, cs_bal, cs_seg, 1,
      |       CASE WHEN t_key IS NOT NULL THEN 'update_new' ELSE 'insert' END
      |FROM j WHERE cs_key IS NOT NULL AND NOT del AND (t_key IS NULL OR changed)
      |""".stripMargin

  /** Evolving-merge gate: the changeset carries a NEW loyalty_tier
    * column (deterministic from the key) — %10==0 rows update acctbal
    * AND gain a tier, %10==2 re-keyed inserts arrive with tiers, and
    * every untouched row must surface with a NULL tier. */
  def mergeEvolveCustomer(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val target = c.withColumn("current_version", lit(1))
    val tier = when(col("c_custkey") % 3 === 0, "gold")
      .when(col("c_custkey") % 3 === 1, "silver").otherwise("bronze")
    val updates = c.filter(col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal", round(col("c_acctbal") + 100, 2))
      .withColumn("loyalty_tier", tier)
      .withColumn("change_seq", lit(1))
    val inserts = c.filter(col("c_custkey") % 10 === 2)
      .withColumn("loyalty_tier", tier) // tier from the ORIGINAL key
      .withColumn("c_custkey", col("c_custkey") + 1000000)
      .withColumn("change_seq", lit(1))
    applyEvolving(target, updates.unionByName(inserts), Seq("c_custkey"),
      "change_seq", Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
  }

  def mergeEvolveOracleSql: String =
    """WITH cs AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |         round(c_acctbal + 100, 2) AS c_acctbal, c_mktsegment,
      |         CASE WHEN c_custkey % 3 = 0 THEN 'gold'
      |              WHEN c_custkey % 3 = 1 THEN 'silver'
      |              ELSE 'bronze' END AS loyalty_tier
      |  FROM customer WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal,
      |         c_mktsegment,
      |         CASE WHEN c_custkey % 3 = 0 THEN 'gold'
      |              WHEN c_custkey % 3 = 1 THEN 'silver'
      |              ELSE 'bronze' END
      |  FROM customer WHERE c_custkey % 10 = 2
      |), j AS (
      |  SELECT t.c_custkey AS t_key, t.c_name AS t_name,
      |         t.c_nationkey AS t_nk, t.c_acctbal AS t_bal,
      |         t.c_mktsegment AS t_seg,
      |         cs.c_custkey AS cs_key, cs.c_name AS cs_name,
      |         cs.c_nationkey AS cs_nk, cs.c_acctbal AS cs_bal,
      |         cs.c_mktsegment AS cs_seg, cs.loyalty_tier AS cs_tier,
      |         (t.c_custkey IS NOT NULL AND cs.c_custkey IS NOT NULL AND NOT
      |          (t.c_name IS NOT DISTINCT FROM cs.c_name AND
      |           t.c_nationkey IS NOT DISTINCT FROM cs.c_nationkey AND
      |           t.c_acctbal IS NOT DISTINCT FROM cs.c_acctbal AND
      |           t.c_mktsegment IS NOT DISTINCT FROM cs.c_mktsegment AND
      |           CAST(NULL AS VARCHAR) IS NOT DISTINCT FROM cs.loyalty_tier))
      |           AS changed
      |  FROM customer t FULL OUTER JOIN cs ON t.c_custkey = cs.c_custkey
      |)
      |SELECT t_key AS c_custkey, t_name AS c_name, t_nk AS c_nationkey,
      |       t_bal AS c_acctbal, t_seg AS c_mktsegment,
      |       CAST(NULL AS VARCHAR) AS loyalty_tier,
      |       CASE WHEN changed THEN 0 ELSE 1 END AS current_version,
      |       CASE WHEN changed THEN 'expired' ELSE 'unchanged' END AS change_type
      |FROM j WHERE t_key IS NOT NULL
      |UNION ALL
      |SELECT cs_key, cs_name, cs_nk, cs_bal, cs_seg, cs_tier, 1,
      |       CASE WHEN t_key IS NOT NULL THEN 'update_new' ELSE 'insert' END
      |FROM j WHERE cs_key IS NOT NULL AND (t_key IS NULL OR changed)""".stripMargin

  def oracleSql: String =
    """WITH cs_all AS (
      |  SELECT c_custkey, c_name, c_nationkey, round(c_acctbal + 50, 2) AS c_acctbal,
      |         c_mktsegment, 1 AS change_seq FROM customer WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, round(c_acctbal + 100, 2) AS c_acctbal,
      |         c_mktsegment, 2 AS change_seq FROM customer WHERE c_custkey % 10 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
      |         c_mktsegment, 1 AS change_seq FROM customer WHERE c_custkey % 10 = 1
      |  UNION ALL
      |  SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal,
      |         c_mktsegment, 1 AS change_seq FROM customer WHERE c_custkey % 10 = 2
      |), cs AS (
      |  SELECT * EXCLUDE (change_seq, rn) FROM (
      |    SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY change_seq DESC) rn
      |    FROM cs_all) WHERE rn = 1
      |), j AS (
      |  SELECT t.c_custkey AS t_key, t.c_name AS t_name, t.c_nationkey AS t_nk,
      |         t.c_acctbal AS t_bal, t.c_mktsegment AS t_seg,
      |         cs.c_custkey AS cs_key, cs.c_name AS cs_name, cs.c_nationkey AS cs_nk,
      |         cs.c_acctbal AS cs_bal, cs.c_mktsegment AS cs_seg,
      |         (t.c_custkey IS NOT NULL AND cs.c_custkey IS NOT NULL AND NOT
      |          (t.c_name IS NOT DISTINCT FROM cs.c_name AND
      |           t.c_nationkey IS NOT DISTINCT FROM cs.c_nationkey AND
      |           t.c_acctbal IS NOT DISTINCT FROM cs.c_acctbal AND
      |           t.c_mktsegment IS NOT DISTINCT FROM cs.c_mktsegment)) AS changed
      |  FROM customer t FULL OUTER JOIN cs ON t.c_custkey = cs.c_custkey
      |)
      |SELECT t_key AS c_custkey, t_name AS c_name, t_nk AS c_nationkey,
      |       t_bal AS c_acctbal, t_seg AS c_mktsegment,
      |       CASE WHEN changed THEN 0 ELSE 1 END AS current_version,
      |       CASE WHEN changed THEN 'expired' ELSE 'unchanged' END AS change_type
      |FROM j WHERE t_key IS NOT NULL
      |UNION ALL
      |SELECT cs_key, cs_name, cs_nk, cs_bal, cs_seg, 1,
      |       CASE WHEN t_key IS NOT NULL THEN 'update_new' ELSE 'insert' END
      |FROM j WHERE cs_key IS NOT NULL AND (t_key IS NULL OR changed)""".stripMargin
}
