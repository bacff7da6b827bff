package graft.ml

import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{FeatureAssembly, Sampling}

/** Class-weighted RandomForest train + eval — the model-training anchor
  * of the reference's pipeline
  * (/root/reference/DataEngineering/DataBricks/spark_randomforest.py:41-72:
  * `RandomForestClassifier(..., weightCol="weights")`, fit on a weighted
  * train split, AUC via BinaryClassificationEvaluator). The data prep
  * slice ([[graft.operators.FeatureAssembly]] and
  * `SchemaTools.classWeights`) was already gated; this completes the
  * anchor with the MLlib fit and a metrics frame.
  *
  * Determinism: fixed seed, deterministic hash split
  * ([[Sampling.portableBucket]] — no `randomSplit`, whose sampling is
  * partitioning-dependent), and balanced class weights computed IN the
  * plan (total / (numClasses · classCount) — the sklearn formula the
  * reference runs driver-side with numpy, spark_randomforest.py:31-37).
  *
  * Scale: MLlib's RF is the distributed histogram algorithm — each
  * iteration aggregates fixed-size per-feature bin statistics (maxBins
  * histograms per feature per node) over the executors; nothing
  * row-shaped ever concentrates on the driver, and the model object is
  * O(trees · nodes). Training therefore scales with the cluster like
  * any tree ensemble; the eval passes are map-side scoring plus one
  * threshold-sort for AUC.
  *
  * Output is a tall (metric, value) frame — counts, AUC, accuracy,
  * majority-class baseline, per-feature importances — rows-gated by the
  * driver (tree structure is engine-internal; no ANSI-SQL oracle
  * exists) with floors and determinism asserted in RandomForestSpec.
  */
object RandomForestTrain {

  /** Deterministic prep + split + train-only balanced weights, shared by
    * every tree-model harness (RF here, GBT in [[GbtTrain]], attribution
    * in [[RfAttribution]]): assemble features, hash-split on `idCol`,
    * compute balanced class weights on the TRAIN split only (the
    * held-out priors must not leak into training, matching the
    * reference's train-side value_counts), broadcast-join them onto
    * train. Returns (train-with-weight, test). */
  private[ml] def prepSplit(df: DataFrame, idCol: String, labelCol: String,
                            featureCols: Seq[String],
                            trainFrac: Double): (DataFrame, DataFrame) = {
    require(trainFrac > 0 && trainFrac < 1, "trainFrac in (0,1)")
    val prepped = FeatureAssembly.assemble(df, featureCols, "__farr")
      .withColumn("features", array_to_vector(col("__farr")))
      .withColumn("label", col(labelCol).cast("double"))
    val thr = (trainFrac * Sampling.M).toLong
    val all = prepped
      .withColumn("__train", Sampling.portableBucket(col(idCol)) < thr)
    val trainRaw = all.filter(col("__train"))
    val test = all.filter(!col("__train"))
    val counts = trainRaw.groupBy("label").agg(count(lit(1)).as("__n"))
    val tot = counts.agg(sum("__n").as("__tot"), count(lit(1)).as("__k"))
    val weights = counts.crossJoin(broadcast(tot))
      .withColumn("weight",
        col("__tot").cast("double") / (col("__k") * col("__n")))
      .select("label", "weight")
    (trainRaw.join(broadcast(weights), "label"), test)
  }

  /** Shared eval: score the held-out split, compute AUC / accuracy /
    * majority baseline / counts, append per-feature importances; one
    * tall (metric, value) frame. `scoredTest` must carry label,
    * rawPrediction, prediction. */
  private[ml] def metricsFrame(train: DataFrame, test: DataFrame,
                               scoredTest: DataFrame, featureCols: Seq[String],
                               importances: Array[Double]): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC").evaluate(scoredTest)
    val acc = new MulticlassClassificationEvaluator()
      .setLabelCol("label").setPredictionCol("prediction")
      .setMetricName("accuracy").evaluate(scoredTest)
    val Seq(nTrain, nTest) = Seq(train, test).map(_.count())
    val majority = test.groupBy("label").agg(count(lit(1)).as("n"))
      .agg(max("n").cast("double") / sum("n")).as[Double].head()
    val rows = Seq(
      "n_train" -> nTrain.toDouble, "n_test" -> nTest.toDouble,
      "majority_baseline" -> majority, "auc" -> auc, "accuracy" -> acc) ++
      importances.zip(featureCols).map {
        case (imp, c) => s"importance_$c" -> imp
      }
    rows.toDF("metric", "value").withColumn("value", round(col("value"), 6))
  }

  /** Fit-or-load seam shared by every RF consumer: with a `storeKey`,
    * route through [[ModelStore.fitOrLoad]] so gated keys over the same
    * (data, params, seed) share ONE distributed fit and always score the
    * persisted artifact (the reference's train-then-serve split,
    * score.py:1-20); without one, fit directly (library callers on
    * ad-hoc frames). */
  private[ml] def fitRf(train: DataFrame, numTrees: Int, maxDepth: Int,
                        seed: Long, storeKey: Option[String])
      : RandomForestClassificationModel = {
    def fit = new RandomForestClassifier()
      .setLabelCol("label").setFeaturesCol("features").setWeightCol("weight")
      .setNumTrees(numTrees).setMaxDepth(maxDepth).setSeed(seed)
      .fit(train)
    storeKey match {
      case Some(k) =>
        ModelStore.fitOrLoad(k, RandomForestClassificationModel.load)(fit)
      case None => fit
    }
  }

  /** Store key for a gated RF fit: data dir + file fingerprint (the
    * generator rewrites tables in place between rounds) + hyperparams +
    * seed + harness version. */
  def rfKey(dir: String, numTrees: Int, maxDepth: Int,
                        seed: Long = 42L, trainFrac: Double = 0.8): String = {
    val fp = ModelStore.fingerprint(dir, Seq("orders"))
    s"rf-v1:$dir:$fp:nt$numTrees:md$maxDepth:s$seed:f$trainFrac"
  }

  /** Train on a deterministic `trainFrac` hash-split of `df`, evaluate
    * on the held-out rows; returns (metric, value) rows. `labelCol`
    * must be 0/1 doubles; `idCol` drives the split. */
  def trainEval(df: DataFrame, idCol: String, labelCol: String,
                featureCols: Seq[String], trainFrac: Double = 0.8,
                numTrees: Int = 20, maxDepth: Int = 5,
                seed: Long = 42L, storeKey: Option[String] = None): DataFrame = {
    val (train, test) = prepSplit(df, idCol, labelCol, featureCols, trainFrac)
    val model = fitRf(train, numTrees, maxDepth, seed, storeKey)
    val scoredTest = model.transform(test).localCheckpoint() // scored once, read by 3 metrics
    metricsFrame(train, test, scoredTest, featureCols,
      model.featureImportances.toArray)
  }

  // ---- query-map entry (rows-gated; floors + determinism in spec) ----

  /** The shared gated-instance feature block (also the GBT and
    * attribution input): planted-signal price threshold label, price
    * carries the signal, date/priority are noise. */
  private[ml] def orderFeatures(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("label01", when(col("o_totalprice") > 250000.0, 1.0).otherwise(0.0))
      .withColumn("f_price", col("o_totalprice"))
      .withColumn("f_year", year(col("o_orderdate")).cast("double"))
      .withColumn("f_month", month(col("o_orderdate")).cast("double"))
      .withColumn("f_priority",
        substring(col("o_orderpriority"), 1, 1).cast("double"))

  private[ml] val orderFeatureCols =
    Seq("f_price", "f_year", "f_month", "f_priority")

  /** Gated instance: high-value-order label (o_totalprice > 250k, the
    * reference's binary-label shape). The driver's synthetic tables have
    * mutually INDEPENDENT columns — no cross-column signal exists to
    * model — so the gate plants recoverable signal instead: the price
    * feature carries the threshold, the date/priority features are
    * noise, and RandomForestSpec asserts the fit finds it (AUC ≫ 0.5,
    * importance concentrated on f_price). A machinery gate for the
    * distributed fit/score/eval path, not a modeling claim. */
  def rfTrainEval(spark: SparkSession, dir: String): DataFrame =
    trainEval(orderFeatures(spark, dir), "o_orderkey", "label01",
      orderFeatureCols, storeKey = Some(rfKey(dir, 20, 5)))
}
