package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._
import graft.ml.{GbtTrain, ModelStore, ParamSweep, RandomForestTrain, RfAttribution}

/** Fit-or-load discipline: the persisted artifact must score exactly
  * like the in-memory fit, a second caller under the same key must LOAD
  * (never refit), key→path mapping must be injective and root-confined,
  * and the data fingerprint must move when backing files move. */
class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def synth = (0L until 500L).map { i =>
    val x = (i * 2654435761L % 1000L).toDouble / 100.0
    (i, if (x > 5.0) 1.0 else 0.0, x, (i % 7).toDouble)
  }.toDF("id", "y", "x1", "x2")

  private def prepped = synth
    .withColumn("__farr", array(col("x1"), col("x2")))
    .withColumn("features", array_to_vector(col("__farr")))
    .withColumn("label", col("y"))
    .withColumn("weight", lit(1.0))

  private def freshKey(tag: String) = {
    val k = s"spec-$tag:${System.nanoTime()}"
    ModelStore.invalidate(k)
    k
  }

  test("roundtrip: loaded artifact scores bit-identically to the direct fit") {
    val train = prepped
    def rf = new RandomForestClassifier()
      .setLabelCol("label").setFeaturesCol("features").setWeightCol("weight")
      .setNumTrees(5).setMaxDepth(3).setSeed(7L)
    val direct = rf.fit(train)
    val loaded = ModelStore.fitOrLoad(freshKey("roundtrip"),
      RandomForestClassificationModel.load)(rf.fit(train))
    val a = direct.transform(train).select("id", "prediction", "probability")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.get(2).toString)).toSet
    val b = loaded.transform(train).select("id", "prediction", "probability")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.get(2).toString)).toSet
    assert(a == b, "persisted model must score exactly like the fit it saved")
  }

  test("second call under the same key loads without refitting; invalidate refits") {
    val train = prepped
    val key = freshKey("refit")
    var fits = 0
    def fitCounted = {
      fits += 1
      new RandomForestClassifier()
        .setLabelCol("label").setFeaturesCol("features").setWeightCol("weight")
        .setNumTrees(3).setMaxDepth(2).setSeed(1L).fit(train)
    }
    ModelStore.fitOrLoad(key, RandomForestClassificationModel.load)(fitCounted)
    ModelStore.fitOrLoad(key, RandomForestClassificationModel.load)(fitCounted)
    assert(fits == 1, s"same key must fit once, loaded $fits times")
    ModelStore.invalidate(key)
    ModelStore.fitOrLoad(key, RandomForestClassificationModel.load)(fitCounted)
    assert(fits == 2, "invalidate must force a refit")
  }

  test("pathFor is injective and never escapes the store root") {
    // "a/b" and "a_b" sanitize to the same pretty prefix — hash disambiguates
    assert(ModelStore.pathFor("a/b") != ModelStore.pathFor("a_b"))
    // hostile keys resolve to fresh children of the root, not the root/parents
    for (k <- Seq("..", ".", "../..", "../../etc")) {
      val p = new File(ModelStore.pathFor(k)).getCanonicalPath
      val root = new File("/tmp/graft_models").getCanonicalPath
      assert(p.startsWith(root + File.separator) && p != root,
        s"key '$k' resolved to $p")
    }
  }

  test("fingerprint tracks file content changes and table membership") {
    val dir = Files.createTempDirectory("graft_fp").toFile
    val t = new File(dir, "orders.parquet")
    Files.write(t.toPath, "v1".getBytes)
    val fp1 = ModelStore.fingerprint(dir.getPath, Seq("orders"))
    assert(fp1 == ModelStore.fingerprint(dir.getPath, Seq("orders")),
      "fingerprint must be stable when nothing changed")
    Files.write(t.toPath, "longer-v2".getBytes) // length change
    val fp2 = ModelStore.fingerprint(dir.getPath, Seq("orders"))
    assert(fp1 != fp2, "rewritten table must change the fingerprint")
  }

  test("gated tree keys share fits: attribution loads train_eval's artifact") {
    // rf_train_eval and rf_attribution build the same key; after the
    // first runs, the artifact exists and the second must consume it.
    val key = RandomForestTrain.rfKey(sfDir, 20, 5)
    ModelStore.invalidate(key)
    RandomForestTrain.rfTrainEval(spark, sfDir).collect()
    assert(new File(ModelStore.pathFor(key), "_GRAFT_SAVED").exists(),
      "rf_train_eval must persist its fit")
    val before = new File(ModelStore.pathFor(key), "_GRAFT_SAVED").lastModified()
    val attr = RfAttribution.rfAttribution(spark, sfDir)
    assert(attr.count() > 0)
    assert(new File(ModelStore.pathFor(key), "_GRAFT_SAVED").lastModified() == before,
      "rf_attribution must load the persisted fit, not refit")
    // same discipline for the boosted pair
    val gkey = GbtTrain.gbtKey(sfDir, 10, 4)
    ModelStore.invalidate(gkey)
    GbtTrain.gbtTrainEval(spark, sfDir).collect()
    assert(RfAttribution.gbtAttribution(spark, sfDir).count() > 0)
    assert(new File(ModelStore.pathFor(gkey), "_GRAFT_SAVED").exists())
  }

  test("sweep points persist per-param fits; (20,5) coincides with rf_train_eval") {
    ParamSweep.rfParamSweep(spark, sfDir).collect()
    for ((nt, md) <- Seq((10, 3), (10, 5), (20, 3), (20, 5)))
      assert(new File(ModelStore.pathFor(
        RandomForestTrain.rfKey(sfDir, nt, md)), "_GRAFT_SAVED").exists(),
        s"sweep point ($nt,$md) must persist its fit")
  }
}
