package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.sources.VersionedTable

/** Incremental exact-dedup against a PERSISTED fingerprint registry —
  * the shape a continuously-ingesting training-data pipeline actually
  * runs: yesterday's corpus is already deduped and its fingerprints
  * live in a versioned registry table; today's batch must (1) drop
  * documents whose fingerprint the registry already holds, (2) dedup
  * WITHIN itself (first doc_id wins), and (3) append the accepted
  * fingerprints as a new registry version — so tomorrow's batch sees
  * them. One batch is two broadcast/shuffle anti-joins + one append
  * commit, never a rescan of the historical corpus: the registry is
  * fingerprint-sized (8 bytes + id per UNIQUE doc), 10⁴× smaller than
  * the text it stands for, and time travel gives every past
  * ingest-decision audit for free.
  *
  * Composes [[graft.functions.PolyFingerprint]] (order-sensitive
  * content hash, [[ExactDedup]]'s discipline) with
  * [[VersionedTable]]; reference anchor: the dedup step of
  * /root/reference/MachineLearning/DeepLearning/generative/
  * embedding_generator.py upstream prep plus merge_generator.py's
  * incremental MERGE.
  */
object IncrementalDedup {

  /** Accepted rows of `batch` (idCol, fp) given the registry snapshot:
    * registry fingerprints lose, then first id per fingerprint wins. */
  def acceptBatch(batch: DataFrame, idCol: String, textCol: String,
                  registry: DataFrame): DataFrame = {
    val fps = batch.select(col(idCol).as("doc_id"),
      TextFunctions.fingerprint(col(textCol)).as("fp"))
    val novel = fps.join(registry.select(col("fp")), Seq("fp"), "left_anti")
    novel.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("fp"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: the even-doc_id half is "yesterday's corpus"
    * (registry v0); today's batch is the WHOLE table. Accepted =
    * odd-id docs whose content isn't an even-doc duplicate, first id
    * per fingerprint. The accepted set is appended as registry v1 and
    * read back THROUGH the table — the hash breaks if either the
    * dedup logic or the registry round-trip drifts. */
  def incrementalDocs(spark: SparkSession, dir: String): DataFrame = {
    val table = graft.TmpPaths.unique("graft_fpreg")
    val docs = Tables.documents(spark, dir)
    val seeded = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"),
        TextFunctions.fingerprint(col("text")).as("fp"))
      .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("fp"))
    VersionedTable.append(spark, table, seeded)
    val accepted = acceptBatch(docs, "doc_id", "text",
      VersionedTable.read(spark, table))
    VersionedTable.append(spark, table, accepted)
    // read the decision back through the registry: v1 minus v0
    VersionedTable.changesBetween(spark, table, 0L, 1L)
      .filter(col("_change_type") === "insert")
      .select(col("doc_id"), col("fp"))
  }

  def oracleSql: String =
    """WITH fp AS (
      |  SELECT doc_id,
      |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split_regex(text, '\s+'),
      |        w -> CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |               list_transform(generate_series(1, len(w)),
      |                 i -> CAST(ascii(substr(w, i, 1)) AS BIGINT))),
      |             (a, c) -> (a*131 + c) % 1000000007) AS BIGINT))),
      |      (a, h) -> (a*31 + h) % 1000000007) AS BIGINT) AS fp
      |  FROM documents
      |), registry AS (
      |  SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0
      |), novel AS (
      |  SELECT * FROM fp
      |  WHERE fp NOT IN (SELECT fp FROM registry)
      |)
      |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, fp
      |FROM novel GROUP BY fp""".stripMargin
}
