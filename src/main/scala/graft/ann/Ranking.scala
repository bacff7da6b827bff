package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared skew-proof top-k extraction used by every ANN variant:
  * phase 1 takes a partial top-k per (query, shuffle partition) — keys
  * uniformly spread, bounded memory — shrinking the scored set to
  * |parts|·|queries|·k before phase 2's final per-query rank, so no
  * reducer ever holds one query's whole scored corpus. */
private[ann] object Ranking {

  /** Keep the top `k` rows per `query_id` under `order`; adds `rankCol`. */
  def partialTopK(scored: DataFrame, k: Int, order: Seq[Column],
                  rankCol: String = "rank"): DataFrame = {
    val part = Window.partitionBy(col("query_id"), spark_partition_id())
      .orderBy(order: _*)
    val full = Window.partitionBy(col("query_id")).orderBy(order: _*)
    scored
      .withColumn("__pr", row_number().over(part)).filter(col("__pr") <= k)
      .withColumn(rankCol, row_number().over(full)).filter(col(rankCol) <= k)
      .drop("__pr")
  }
}
