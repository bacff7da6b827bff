package graft.ml

import org.apache.spark.ml.classification.RandomForestClassificationModel
import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit, InternalNode, LeafNode, Node}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-row feature attribution for a fitted RandomForest — the
  * Saabas path-contribution method, the distributed Spark-native
  * analogue of the reference's per-row SHAP explanation
  * (/root/reference/MachineLearning/SHAP/shap_demo_xgb.py:20-40 computes
  * per-row shap_values for a fitted xgb model; `rf_train_eval` covers
  * only the global importances at :14).
  *
  * Method: for each row and each tree, walk root→leaf; at every internal
  * node the change in node prediction from parent to chosen child is
  * credited to the feature the node splits on. The telescoping sum makes
  * the decomposition EXACT per tree:
  *   leaf = root + Σ_path (child − parent)
  * so averaging over trees gives score(row) = baseline + Σ_f contrib_f
  * bit-exactly (assertable to float round-off in the spec — Saabas'
  * property, which sampling-based SHAP only approaches).
  *
  * Node values are the public `Node.prediction` (majority class at the
  * node), so the per-tree walk contributes class-vote units and the
  * averaged score is the forest's VOTE SHARE for class 1 — the model's
  * own hard-vote aggregation, chosen because MLlib keeps per-node class
  * distributions `private[ml]`. The additivity and signal-concentration
  * properties the spec gates are identical in either unit.
  *
  * Scale: the fitted model is O(trees·nodes) and rides the task closure;
  * attribution is one map-side pass over the rows (mapPartitions — the
  * per-row tree walk is genuinely imperative, the same documented seam
  * as EmbedDocs' per-partition model init). No shuffle, no driver rows.
  */
object RfAttribution {

  /** Walk `node` for `feats`, crediting WEIGHTED prediction deltas to
    * split features in `contrib`; returns the leaf prediction. */
  @annotation.tailrec
  private def walk(node: Node, feats: Array[Double], w: Double,
                   contrib: Array[Double]): Double = node match {
    case leaf: LeafNode => leaf.prediction
    case n: InternalNode =>
      val f = n.split.featureIndex
      val goLeft = n.split match {
        case c: ContinuousSplit  => feats(f) <= c.threshold
        case c: CategoricalSplit => c.leftCategories.contains(feats(f))
      }
      val child = if (goLeft) n.leftChild else n.rightChild
      contrib(f) += w * (child.prediction - n.prediction)
      walk(child, feats, w, contrib)
  }

  /** Per-row contributions of a weighted tree ensemble: for every row
    * of `rows` (must carry `idCol`, `label`, and `featCol` =
    * array<double> in `featureCols` order), emit (id, label, baseline,
    * score, contrib_<f>...) with score = Σᵢ wᵢ·leafᵢ = baseline +
    * Σ contribs exactly. RF passes uniform weights 1/n (score = vote
    * share); GBT passes its treeWeights (score = additive margin). */
  def ensembleContributions(trees: Array[Node], weights: Array[Double],
                            rows: DataFrame, idCol: String, featCol: String,
                            featureCols: Seq[String]): DataFrame = {
    require(trees.length == weights.length, "one weight per tree")
    val spark = rows.sparkSession
    val baseline = trees.zip(weights).map { case (t, w) => w * t.prediction }.sum
    val k = featureCols.length
    val outSchema = StructType(
      StructField("id", LongType) +: StructField("label", DoubleType) +:
      StructField("baseline", DoubleType) +: StructField("score", DoubleType) +:
      featureCols.map(c => StructField(s"contrib_$c", DoubleType)))
    val out = rows.select(col(idCol).cast("long"), col("label"), col(featCol))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val feats = r.getSeq[Double](2).toArray
          val contrib = new Array[Double](k)
          var score = 0.0
          var i = 0
          while (i < trees.length) {
            score += weights(i) * walk(trees(i), feats, weights(i), contrib)
            i += 1
          }
          Row.fromSeq(r.getLong(0) +: r.getDouble(1) +: baseline +: score +:
            contrib.toSeq)
        }
      }
    spark.createDataFrame(out, outSchema)
  }

  /** RF form: uniform weights 1/nTrees — score is the forest's vote
    * share for class 1 (see object doc). */
  def contributions(model: RandomForestClassificationModel, rows: DataFrame,
                    idCol: String, featCol: String,
                    featureCols: Seq[String]): DataFrame = {
    val trees = model.trees.map(_.rootNode)
    ensembleContributions(trees,
      Array.fill(trees.length)(1.0 / trees.length), rows, idCol, featCol,
      featureCols)
  }

  // ---- query-map entry (rows-gated; additivity + signal in spec) ----

  /** Gated instance: fit the same planted-signal RF as `rf_train_eval`,
    * attribute every held-out row. The spec asserts exact additivity and
    * that |contrib| mass concentrates on the planted signal feature. */
  def rfAttribution(spark: SparkSession, dir: String): DataFrame = {
    val featureCols = RandomForestTrain.orderFeatureCols
    val (train, test) = RandomForestTrain.prepSplit(
      RandomForestTrain.orderFeatures(spark, dir), "o_orderkey", "label01",
      featureCols, trainFrac = 0.8)
    // SAME store key as `rf_train_eval` — identical data/params/seed, so
    // attribution consumes that key's persisted fit instead of refitting.
    val model = RandomForestTrain.fitRf(train, numTrees = 20, maxDepth = 5,
      seed = 42L, storeKey = Some(RandomForestTrain.rfKey(dir, 20, 5)))
    contributions(model, test, "o_orderkey", "__farr", featureCols)
  }

  /** GBT form — the faithful twin of the reference's SHAP demo (which
    * explains a BOOSTED model): contributions in additive-margin units,
    * score = Σᵢ wᵢ·treeᵢ(x) with the model's own treeWeights, so
    * additivity is exact in exactly the space the booster predicts in. */
  def gbtAttribution(spark: SparkSession, dir: String): DataFrame = {
    val featureCols = RandomForestTrain.orderFeatureCols
    val (train, test) = RandomForestTrain.prepSplit(
      RandomForestTrain.orderFeatures(spark, dir), "o_orderkey", "label01",
      featureCols, trainFrac = 0.8)
    // Shares `gbt_train_eval`'s persisted fit (same key) — see rfAttribution.
    val model = GbtTrain.fitGbt(train, maxIter = 10, maxDepth = 4,
      seed = 42L, storeKey = Some(GbtTrain.gbtKey(dir, 10, 4)))
    ensembleContributions(model.trees.map(_.rootNode), model.treeWeights,
      test, "o_orderkey", "__farr", featureCols)
  }
}
