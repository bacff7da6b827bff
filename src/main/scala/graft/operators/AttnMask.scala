package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}
import graft.Tables

/** Tabular-transformer feature prep: missing-sentinel normalization +
  * per-feature attention masks + typed null fill — the exact pipeline
  * of /root/reference/DataEngineering/DataBricks/discover_schema.py:
  * `"<missing>"` strings become NULL, every `INPUT_` feature gets a
  * 0/1 `_attnmask` column (1 = present; the mask feeds the masked
  * softmax in tune_tabular_transformer.py:128-135, which sets absent
  * features to −inf attention), then nulls are filled with the typed
  * neutral (0 for numerics, the sentinel for strings) so the tensor
  * columns are dense.
  *
  * Everything is one map-side projection — column-count-many CASE
  * expressions, zero shuffles at any row count; the schema walk
  * happens at plan time on the driver. [[SchemaTools]] covers the
  * smallest-type shrink and distinct-ratio classification halves of
  * the same reference file.
  */
object AttnMask {

  /** For each `inputCols` column: normalize `sentinel` (string cols)
    * to NULL, append `<col>_attnmask` (1 = value present), and fill
    * nulls with 0 / the sentinel by type. Non-input columns pass
    * through untouched. */
  def attnMaskPrep(df: DataFrame, inputCols: Seq[String],
                   sentinel: String = "<missing>"): DataFrame = {
    val fields = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val out = df.columns.toSeq.flatMap { c =>
      if (!inputCols.contains(c)) Seq(col(c))
      else fields(c) match {
        case StringType =>
          val norm = when(col(c) === sentinel, lit(null)).otherwise(col(c))
          Seq(coalesce(norm, lit(sentinel)).as(c),
            when(norm.isNull, 0).otherwise(1).as(s"${c}_attnmask"))
        case _: NumericType =>
          Seq(coalesce(col(c), lit(0).cast(fields(c))).as(c),
            when(col(c).isNull, 0).otherwise(1).as(s"${c}_attnmask"))
        case other =>
          throw new IllegalArgumentException(
            s"attnMaskPrep: unsupported input column type $other for $c")
      }
    }
    df.select(out: _*)
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: customer projected to three INPUT_ features with
    * deterministically planted missingness — a numeric with NULLs
    * (%11 keys), a string carrying the literal sentinel (%7 keys —
    * must normalize → mask 0 → refill), and a small numeric with NULLs
    * (%13 keys). Every mask/fill branch fires inside the gate. */
  def attnMaskCustomer(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(
      col("c_custkey"),
      when(col("c_custkey") % 11 === 0, lit(null))
        .otherwise(round(col("c_acctbal") * 100).cast("long"))
        .as("INPUT_bal_cents"),
      when(col("c_custkey") % 7 === 0, lit("<missing>"))
        .otherwise(col("c_mktsegment")).as("INPUT_segment"),
      when(col("c_custkey") % 13 === 0, lit(null))
        .otherwise(col("c_nationkey").cast("int")).as("INPUT_nation"))
    attnMaskPrep(c,
      Seq("INPUT_bal_cents", "INPUT_segment", "INPUT_nation"))
  }

  def oracleSql: String =
    """SELECT c_custkey,
      |  CASE WHEN c_custkey % 11 = 0 THEN 0
      |       ELSE CAST(round(c_acctbal * 100) AS BIGINT) END AS INPUT_bal_cents,
      |  CASE WHEN c_custkey % 11 = 0 THEN 0 ELSE 1 END AS INPUT_bal_cents_attnmask,
      |  CASE WHEN c_custkey % 7 = 0 THEN '<missing>'
      |       ELSE c_mktsegment END AS INPUT_segment,
      |  CASE WHEN c_custkey % 7 = 0 THEN 0 ELSE 1 END AS INPUT_segment_attnmask,
      |  CASE WHEN c_custkey % 13 = 0 THEN 0
      |       ELSE CAST(c_nationkey AS INT) END AS INPUT_nation,
      |  CASE WHEN c_custkey % 13 = 0 THEN 0 ELSE 1 END AS INPUT_nation_attnmask
      |FROM customer""".stripMargin
}
