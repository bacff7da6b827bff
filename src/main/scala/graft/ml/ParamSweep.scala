package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Concurrent

/** Hyperparameter grid sweep through the shared tree harness — the
  * tuning loop of the reference's tabular stack
  * (/root/reference/MachineLearning/Ray/tabular/tune.py runs a Ray Tune
  * search over xgboost params; tabular/boost.py fixes the winner). The
  * Spark-native re-expression: each grid point is a full distributed
  * train/eval through [[RandomForestTrain.trainEval]] (same
  * deterministic hash split and train-only weights, so points differ
  * ONLY in hyperparameters), and the points run CONCURRENTLY on FAIR
  * scheduler pools via [[Concurrent.runAll]] — the cluster is kept busy
  * the way Ray Tune keeps its workers busy, with no coupling between
  * trials.
  *
  * Scale: each trial is itself fully distributed (MLlib histogram
  * aggregates); the sweep adds driver-side orchestration only. Output
  * is one (num_trees, max_depth, auc, accuracy, is_best) row per grid
  * point — deterministic (fixed seed + hash split per trial), with the
  * winner marked by (auc DESC, num_trees ASC, max_depth ASC) so ties
  * break toward the cheaper model.
  */
object ParamSweep {

  /** Run `grid` (numTrees, maxDepth) points concurrently; returns the
    * per-point metric frame with the winner flagged. `keyFor` maps a
    * grid point to an optional [[ModelStore]] key — gated instances use
    * it so each point's fit persists (and points matching another gated
    * key, e.g. the sweep's (20,5) vs `rf_train_eval`, share ONE fit). */
  def rfSweep(df: DataFrame, idCol: String, labelCol: String,
              featureCols: Seq[String],
              grid: Seq[(Int, Int)], parallelism: Int = 4,
              keyFor: (Int, Int) => Option[String] = (_, _) => None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val jobs = grid.map { case (nt, md) =>
      s"rf_${nt}_$md" -> (() => {
        val m = RandomForestTrain.trainEval(df, idCol, labelCol, featureCols,
          numTrees = nt, maxDepth = md, storeKey = keyFor(nt, md))
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        (nt, md, m("auc"), m("accuracy"))
      })
    }
    val rows = Concurrent.runAll(spark, jobs, parallelism).map(_._2)
    val best = rows.sortBy { case (nt, md, auc, _) => (-auc, nt, md) }.head
    rows.map { case (nt, md, auc, acc) =>
      (nt, md, auc, acc, if ((nt, md) == (best._1, best._2)) 1 else 0)
    }.toDF("num_trees", "max_depth", "auc", "accuracy", "is_best")
  }

  // ---- query-map entry (rows-gated; grid shape + winner in spec) ----

  /** Gated instance: 2×2 grid over the planted-signal orders features.
    * Every point must find the planted threshold (the signal is easy),
    * so the sweep gates the ORCHESTRATION: all points trained, metrics
    * per point, exactly one winner, deterministic across runs. */
  def rfParamSweep(spark: SparkSession, dir: String): DataFrame =
    rfSweep(RandomForestTrain.orderFeatures(spark, dir), "o_orderkey",
      "label01", RandomForestTrain.orderFeatureCols,
      grid = Seq((10, 3), (10, 5), (20, 3), (20, 5)),
      keyFor = (nt, md) => Some(RandomForestTrain.rfKey(dir, nt, md)))
}
