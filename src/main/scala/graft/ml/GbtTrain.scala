package graft.ml

import org.apache.spark.ml.classification.{GBTClassificationModel, GBTClassifier}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Class-weighted gradient-boosted-trees train + eval — the XGBoost leg
  * of the reference's tabular stack
  * (/root/reference/MachineLearning/Ray/tabular/minimal_xgboost_ray.py
  * trains xgboost on Ray; MachineLearning/SHAP/shap_demo_xgb.py:1-20 fits
  * xgb before explaining it), re-expressed as MLlib's `GBTClassifier`
  * through the exact [[RandomForestTrain]] harness: same deterministic
  * hash split, same train-only balanced class weights, same
  * (metric, value) output frame — so RF and GBT results are directly
  * comparable row-for-row.
  *
  * Scale: MLlib GBT is sequential over iterations but each iteration is
  * the same distributed histogram-aggregate tree build as RF — per-node
  * fixed-size bin statistics over the executors, nothing row-shaped on
  * the driver. Cost is maxIter × one-tree build; model is O(trees·nodes).
  *
  * Rows-gated (tree ensemble internals have no ANSI-SQL oracle) with the
  * same planted-signal floors + determinism discipline as
  * RandomForestSpec, in GbtSpec.
  */
object GbtTrain {

  /** Fit-or-load seam (see [[RandomForestTrain.fitRf]]): gated keys
    * share one boosted fit via [[ModelStore]]; library callers fit. */
  private[ml] def fitGbt(train: DataFrame, maxIter: Int, maxDepth: Int,
                         seed: Long, storeKey: Option[String])
      : GBTClassificationModel = {
    def fit = new GBTClassifier()
      .setLabelCol("label").setFeaturesCol("features").setWeightCol("weight")
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed)
      .fit(train)
    storeKey match {
      case Some(k) => ModelStore.fitOrLoad(k, GBTClassificationModel.load)(fit)
      case None    => fit
    }
  }

  /** Store key for a gated GBT fit (same identity discipline as
    * [[RandomForestTrain.rfKey]]). */
  def gbtKey(dir: String, maxIter: Int, maxDepth: Int,
                         seed: Long = 42L, trainFrac: Double = 0.8): String = {
    val fp = ModelStore.fingerprint(dir, Seq("orders"))
    s"gbt-v1:$dir:$fp:it$maxIter:md$maxDepth:s$seed:f$trainFrac"
  }

  /** Train on a deterministic `trainFrac` hash-split of `df`, evaluate
    * on the held-out rows; returns (metric, value) rows. `labelCol`
    * must be 0/1 doubles; `idCol` drives the split. */
  def trainEval(df: DataFrame, idCol: String, labelCol: String,
                featureCols: Seq[String], trainFrac: Double = 0.8,
                maxIter: Int = 10, maxDepth: Int = 4,
                seed: Long = 42L, storeKey: Option[String] = None): DataFrame = {
    val (train, test) =
      RandomForestTrain.prepSplit(df, idCol, labelCol, featureCols, trainFrac)
    val model = fitGbt(train, maxIter, maxDepth, seed, storeKey)
    val scoredTest = model.transform(test).localCheckpoint()
    RandomForestTrain.metricsFrame(train, test, scoredTest, featureCols,
      model.featureImportances.toArray)
  }

  // ---- query-map entry (rows-gated; floors + determinism in GbtSpec) ----

  /** Gated instance: same planted-signal orders features as
    * `rf_train_eval` — the machinery gate for the boosted fit. */
  def gbtTrainEval(spark: SparkSession, dir: String): DataFrame =
    trainEval(RandomForestTrain.orderFeatures(spark, dir), "o_orderkey",
      "label01", RandomForestTrain.orderFeatureCols,
      storeKey = Some(gbtKey(dir, 10, 4)))
}
