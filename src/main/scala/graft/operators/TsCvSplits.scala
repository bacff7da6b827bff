package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Expanding-window time-series cross-validation splits — the
  * forecasting-correct CV beside [[KFold]]'s iid folds (shuffled folds
  * LEAK the future into a time-series train set; every backtest in the
  * forecast family implicitly uses one expanding split, this operator
  * materializes the full schedule the reference's tuner evaluates
  * over, stats_forecast_tune.py's evaluate_models_with_cv):
  * the observed span is cut into k+1 equal calendar slices; fold f
  * trains on everything through slice f and tests on slice f+1.
  *
  * All date arithmetic is exact integers (days since the observed
  * minimum, truncating division for the slice width); fold boundaries
  * derive from ONE min/max aggregate, membership counting is a second
  * aggregate over the fact joined to the k-row boundary table — rows
  * out are k, never fact-shaped. Folds verify: train counts are
  * monotone (expanding), train+test never overlap, test windows tile
  * the span. */
object TsCvSplits {

  /** k fold rows: (fold, train_end_off, test_end_off, n_train, n_test)
    * with offsets in days since the observed minimum of `tsCol`. */
  def splits(df: DataFrame, tsCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val days = df.select(col(tsCol).cast("date").as("d"))
    val bounds = days.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("d0"), datediff(col("d1"), col("d0")).as("span"))
    val folds = (1 to k).toDF("fold")
    val sched = folds.crossJoin(broadcast(bounds))
      // slice width = ⌊span/(k+1)⌋ exactly; the last test window runs
      // to fold·width + width, so an indivisible span leaves a tail
      // outside every fold — declared (the tuner's holdout remainder)
      .select(col("fold"), col("d0"),
        expr(s"fold * (span div ${k + 1})").as("train_end_off"),
        expr(s"(fold + 1) * (span div ${k + 1})").as("test_end_off"))
      .localCheckpoint() // k rows, joined back to the fact
    val offs = days.crossJoin(broadcast(bounds.select(col("d0").as("d00"))))
      .select(datediff(col("d"), col("d00")).as("off"))
    offs.crossJoin(broadcast(sched))
      .groupBy(col("fold"), col("train_end_off"), col("test_end_off"))
      .agg(
        sum(when(col("off") <= col("train_end_off"), 1L).otherwise(0L))
          .as("n_train"),
        sum(when(col("off") > col("train_end_off")
          && col("off") <= col("test_end_off"), 1L).otherwise(0L))
          .as("n_test"))
      .select(col("fold"), col("train_end_off").cast("long"),
        col("test_end_off").cast("long"), col("n_train"), col("n_test"))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: 4 expanding folds over the event feed. */
  def tsCvEvents(spark: SparkSession, dir: String): DataFrame =
    splits(Tables.events(spark, dir), "ts", k = 4)

  def oracleSql: String =
    """WITH days AS (
      |  SELECT CAST(ts AS DATE) AS d FROM events
      |), bounds AS (
      |  SELECT min(d) AS d0, date_diff('day', min(d), max(d)) AS span
      |  FROM days
      |), sched AS (
      |  SELECT f.fold,
      |    f.fold * (b.span // 5) AS train_end_off,
      |    (f.fold + 1) * (b.span // 5) AS test_end_off
      |  FROM (SELECT unnest(range(1, 5)) AS fold) f CROSS JOIN bounds b
      |), offs AS (
      |  SELECT date_diff('day', b.d0, d.d) AS off
      |  FROM days d CROSS JOIN bounds b
      |)
      |SELECT CAST(s.fold AS INT) AS fold,
      |  CAST(s.train_end_off AS BIGINT) AS train_end_off,
      |  CAST(s.test_end_off AS BIGINT) AS test_end_off,
      |  CAST(sum(CASE WHEN o.off <= s.train_end_off THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_train,
      |  CAST(sum(CASE WHEN o.off > s.train_end_off
      |    AND o.off <= s.test_end_off THEN 1 ELSE 0 END) AS BIGINT) AS n_test
      |FROM sched s CROSS JOIN offs o
      |GROUP BY 1, 2, 3""".stripMargin
}
