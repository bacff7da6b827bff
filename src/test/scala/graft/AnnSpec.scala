package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import graft.ann.{BruteForceKnn, IvfAnn, LshAnn}

/** ANN specs (#32–33): brute-force against hand-computed ground truth;
  * LSH recall measured against brute-force on the real sf0.001 vectors
  * (deterministic hyperplanes → the recall is a fixed number, not flaky). */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = Seq(
      Row(0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      Row(1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),  // closest to 0
      Row(2L, Seq(0.5f, 0.5f, 0.0f, 0.0f)),  // second
      Row(3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),  // orthogonal to 0
      Row(4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))) // opposite
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("kmeans step: planted clusters assign exactly, means truncate toward zero") {
    import spark.implicits._
    import graft.ann.KmeansStep
    // d=2, values exactly representable in float32 so quantize(·1000)
    // is closed-form; seeds = ids 0,1. p3's negative dim pins the
    // truncating (not flooring) integer mean: -250 div 3 = -83.
    val pts = Seq(
      0L -> Array(0.0f, 0.0f),   // seed c0
      1L -> Array(1.0f, 1.0f),   // seed c1
      2L -> Array(0.25f, 0.0f),  // -> c0
      3L -> Array(-0.25f, -0.25f), // -> c0
      4L -> Array(0.75f, 1.0f),  // -> c1
      5L -> Array(1.25f, 0.75f)) // -> c1
    val df = pts.toDF("vec_id", "embedding")
    val got = KmeansStep.step(df, "vec_id", "embedding", k = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val expected = Set(
      (0L, 0L, 3L, 0L, 0L),      // c0 dim0: 0 + 250 - 250
      (0L, 1L, 3L, -250L, -83L), // c0 dim1: truncating negative mean
      (1L, 0L, 3L, 3000L, 1000L),
      (1L, 1L, 3L, 2750L, 916L))
    assert(got == expected, s"kmeans step wrong: $got")
    val again = KmeansStep.step(df.repartition(7), "vec_id", "embedding", 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(again == expected, "kmeans step not partitioning-invariant")
  }

  test("kmeans iterate: bad seeds converge to the exact planted cluster means") {
    import spark.implicits._
    import graft.ann.KmeansStep
    // both seeds (ids 0, 1) sit in the origin cluster; Lloyd must pull
    // c1 across to the far cluster and converge to the exact means
    val pts = Seq(
      0L -> Array(0.0f, 0.0f), 1L -> Array(0.25f, 0.0f),
      2L -> Array(0.0f, 0.25f), 3L -> Array(-0.25f, -0.25f),
      4L -> Array(10.0f, 10.0f), 5L -> Array(10.25f, 10.0f),
      6L -> Array(10.0f, 10.25f), 7L -> Array(9.75f, 9.75f))
    val df = pts.toDF("vec_id", "embedding")
    val got = KmeansStep.iterate(df, "vec_id", "embedding", k = 2, iters = 3)
      .select("centroid", "dim", "n_assigned", "mean_milli")
      .as[(Long, Long, Long, Long)].collect().toSet
    val expected = Set(
      (0L, 0L, 4L, 0L), (0L, 1L, 4L, 0L),
      (1L, 0L, 4L, 10000L), (1L, 1L, 4L, 10000L))
    assert(got == expected, s"did not converge to planted means: $got")
  }

  test("brute-force knn ranks by cosine with deterministic tie-break") {
    val got = BruteForceKnn.topK(vecs, vecs.filter($"vec_id" === 0L),
        "vec_id", "embedding", k = 3)
      .orderBy("rank").select("neighbor_id", "rank")
      .as[(Long, Int)].collect().toList
    assert(got == List((1L, 1), (2L, 2), (3L, 3)), s"got $got")
  }

  test("lsh buckets: identical vectors always collide in every table") {
    val dup = vecs.union(vecs.withColumn("vec_id", $"vec_id" + 100L))
    val p = LshAnn.postings(dup.filter($"vec_id".isin(0L, 100L)), "vec_id", "embedding")
      .as[(Long, Int, Int)].collect().groupBy(_._1)
    val b0 = p(0L).map(r => (r._2, r._3)).toSet
    val b100 = p(100L).map(r => (r._2, r._3)).toSet
    assert(b0 == b100)
  }

  test("ivf recall vs brute force on sf0.001 embeddings, deterministic across partitionings") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = BruteForceKnn.querySubset(emb)
    val exact = BruteForceKnn.topK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = graft.ann.IvfAnn.topK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"ivf recall = $recall%.3f (nprobe=${graft.ann.IvfAnn.NProbe}/${graft.ann.IvfAnn.NList} lists)")
    assert(recall >= 0.5, f"recall $recall%.3f below floor")
    // integer-arithmetic k-means must be partitioning-invariant
    val again = graft.ann.IvfAnn.topK(emb.repartition(7), q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(approx == again)
  }

  test("pq adc recall vs brute force on sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = BruteForceKnn.querySubset(emb)
    val exact = BruteForceKnn.topK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = graft.ann.PqAnn.topK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"pq recall = $recall%.3f (rerank pool ${graft.ann.PqAnn.RerankFactor}x)")
    assert(recall >= 0.5, f"recall $recall%.3f below floor")
  }

  test("ivfpq (residual coding) recall vs brute force on sf0.001 embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = BruteForceKnn.querySubset(emb)
    val exact = BruteForceKnn.topK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = graft.ann.IvfPqAnn.topK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"ivfpq recall = $recall%.3f (nprobe=${graft.ann.IvfPqAnn.NProbe}/${graft.ann.IvfAnn.NList})")
    // bounded by the IVF probe recall; near-random vectors are the hard case
    assert(recall >= 0.4, f"recall $recall%.3f below floor")
  }

  test("pq codes are within range and encoding is deterministic") {
    val emb = Tables.embeddings(spark, sfDir)
    val books = graft.ann.PqAnn.trainCodebooks(emb, "vec_id", "embedding")
    assert(books.length == graft.ann.PqAnn.SubSpaces)
    assert(books.forall(_.length == graft.ann.PqAnn.Codes))
    val c1 = graft.ann.PqAnn.encode(emb, "vec_id", "embedding", books)
      .as[(Long, Seq[Int])].collect().toMap
    assert(c1.values.forall(cs => cs.length == graft.ann.PqAnn.SubSpaces &&
      cs.forall(c => c >= 0 && c < graft.ann.PqAnn.Codes)))
    val c2 = graft.ann.PqAnn.encode(emb.repartition(9), "vec_id", "embedding", books)
      .as[(Long, Seq[Int])].collect().toMap
    assert(c1 == c2)
  }

  test("nearest-centroids kernel: ordered by distance, ties to lower id") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val cents = Seq(
      Seq(10L, 0L),   // id 0: dist 100 to q=(0,0)
      Seq(0L, 3L),    // id 1: dist 9
      Seq(3L, 0L),    // id 2: dist 9 (tie with 1 -> 1 wins)
      Seq(1L, 1L),    // id 3: dist 2
      Seq(100L, 100L))
    val q = new GenericArrayData(Array(0L, 0L))
    val got = graft.functions.NearestCentroids
      .compute(q, cents.map(_.toArray).toArray, 3).toIntArray().toList
    assert(got == List(3, 1, 2), s"got $got")
    // nprobe > nlist degrades to all centroids, still ordered
    val all = graft.functions.NearestCentroids
      .compute(q, cents.map(_.toArray).toArray, 10).toIntArray().toList
    assert(all == List(3, 1, 2, 0, 4), s"got $all")
  }

  test("ivf plan size stays flat as nlist grows 16 -> 256 (compiled probe/assign)") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = BruteForceKnn.querySubset(emb)
    def planLen(nlist: Int): Int =
      graft.ann.IvfAnn.topK(emb, q, "vec_id", "embedding", 5, nlist = nlist,
        nprobe = 4).queryExecution.executedPlan.toString.length
    val p16 = planLen(16)
    val p256 = planLen(256)
    // centroids ride as expression constructor data, not plan nodes: 16x
    // the centroid count must not show up in the physical plan text (the
    // old struct-array formulation grew it linearly)
    assert(p256 < p16 * 1.5, s"plan grew with nlist: $p16 -> $p256")
    val rows = graft.ann.IvfAnn.topK(emb, q, "vec_id", "embedding", 5,
      nlist = 64, nprobe = 8).count()
    assert(rows > 0)
  }

  test("pq trains and scans at the reference's 8-bit code count (Codes=256)") {
    // the round-4 expression-tree ADC shape could not reach PQ8x8
    // (8x256 = 2,048 subexpressions, past the codegen method limit);
    // the compiled PqDistTables/AdcSum path must handle it outright.
    // 2,000 synthetic vectors: the sf0.001 table's 50% training sample
    // is smaller than 256 and can't seed a full 8-bit codebook
    val emb = (0 until 2000).map { i =>
      (i.toLong, graft.operators.EmbedDocs.RandomProjectionEncoder
        .encodeBatch(Seq(s"pq8x8 doc $i")).head.toSeq)
    }.toDF("vec_id", "embedding")
    val books = graft.ann.PqAnn.trainCodebooks(emb, "vec_id", "embedding", codes = 256)
    assert(books.forall(_.length == 256))
    val codes = graft.ann.PqAnn.encode(emb, "vec_id", "embedding", books)
    val got = codes.as[(Long, Seq[Int])].collect()
    assert(got.nonEmpty && got.forall(_._2.forall(c => c >= 0 && c < 256)))
    // distance-table scan evaluates and its plan stays code-count-flat
    import graft.functions.VectorFunctions.quantizeUnit
    val q = emb.limit(3).select(col("vec_id"),
      graft.ann.PqAnn.distTables(quantizeUnit(col("embedding")), books).as("t"))
    assert(q.queryExecution.executedPlan.toString.length < 20000)
    val tables = q.select("t").as[Seq[Seq[Long]]].collect()
    assert(tables.forall(t => t.length == graft.ann.PqAnn.SubSpaces &&
      t.forall(_.length == 256)))
  }

  test("lsh recall vs brute force on sf0.001 embeddings >= 0.8") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = BruteForceKnn.querySubset(emb)
    val exact = BruteForceKnn.topK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = LshAnn.topK(emb, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    info(f"lsh recall = $recall%.3f (${exact.size} exact pairs)")
    assert(recall >= 0.8, f"recall $recall%.3f below floor")
  }

  test("ivf/lsh/pq degeneracies are bit-identical to brute force") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val bf = rows(BruteForceKnn.annBruteforce(spark, sfDir))
    assert(bf.nonEmpty)
    assert(rows(IvfAnn.annIvfExhaustive(spark, sfDir)) == bf, "ivf full-probe")
    assert(rows(LshAnn.annLshExhaustive(spark, sfDir)) == bf, "lsh 1-table-1-bit")
    assert(rows(graft.ann.PqAnn.annPqExhaustive(spark, sfDir)) == bf, "pq full-pool")
  }
}
