package graft.ann

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** The combined IVF+PQ index — the reference's full factory string
  * (/root/reference/MachineLearning/ML/performant_faiss.py:7,
  * `IVF65536,PQ8x8`), composed from [[IvfAnn]]'s coarse quantizer and
  * [[PqAnn]]'s product codes, with textbook RESIDUAL coding: each vector
  * stores (list id, PQ codes of v − centroid(list)). Residuals are far
  * smaller in magnitude than raw vectors, so the same code budget buys a
  * finer quantization grid. A query probes its nprobe nearest lists and
  * ADC-scans only those lists' codes with a per-(query, list) residual
  * distance table; the approximate top pool re-ranks exactly.
  *
  * Scale shape: the stored index is (int list id + SubSpaces code ids)
  * per vector — the compressed-corpus memory story of PQ — and search
  * touches nprobe/nlist of it — the pruned-scan story of IVF. All
  * training/encoding runs in deterministic integer arithmetic, so the
  * index and results are bit-identical across runs and partitionings.
  */
object IvfPqAnn {

  val NProbe = 4
  // index build is one-time at real scale; fewer k-means rounds than the
  // standalone variants keeps the per-run build cost proportionate
  val TrainIters = 3

  /** Approximate top-k via probed-list ADC + exact re-rank. */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
           vecCol: String, k: Int): DataFrame = {
    // coarse quantizer + codebooks over residuals, all in unit space
    // (integer L2 there is a monotone proxy for cosine)
    val sample = corpus
      .select(col(idCol).as("__id"), quantizeUnit(col(vecCol)).as("__q"))
      .filter(graft.operators.Sampling.portableBucket(col("__id")) <
        (IvfAnn.TrainFrac * graft.operators.Sampling.M).toLong)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centroids = IvfAnn.kmeansQ(sample, IvfAnn.NList, TrainIters)
    val centArr = centroids.sortBy(_._1).map(_._2)
    val centLit = typedlit(centArr)
    def residual(vec: Column, cid: Column): Column =
      zip_with(vec, element_at(centLit, cid + 1), (a, b) => a - b)

    val books = PqAnn.trainCodebooksFromQ(
      IvfAnn.assign(sample, "__q", centroids)
        .select(col("__id"), residual(col("__q"), col("__cid")).as("__qfull")),
      PqAnn.Codes, TrainIters)
    sample.unpersist()

    // the stored index: (neighbor_id, list id, residual PQ codes)
    val cq = corpus.select(col(idCol).as("neighbor_id"), quantizeUnit(col(vecCol)).as("__q"))
    val index = IvfAnn.assign(cq, "__q", centroids)
      .select(col("neighbor_id"), col("__cid"),
        PqAnn.assignCodes(residual(col("__q"), col("__cid")), books).as("pq_codes"))

    // query side: nprobe nearest lists, one residual table per probed list
    val qu = queries.select(col(idCol).as("query_id"), quantizeUnit(col(vecCol)).as("__qu"))
    val probeScores: Column = array(centroids.sortBy(_._1).map { case (cid, c) =>
      val c2 = c.map(x => x * x).sum
      struct((lit(-2L) * dotQ(col("__qu"), typedlit(c)) + lit(c2)).as("dist"),
        lit(cid).as("cid"))
    }: _*)
    val qProbes = qu
      .withColumn("__probe",
        slice(transform(array_sort(probeScores), s => s.getField("cid")), 1, NProbe))
      .select(col("query_id"), col("__qu"), explode(col("__probe")).as("__cid"))
      .withColumn("__tables",
        PqAnn.distTables(residual(col("__qu"), col("__cid")), books))
      .select("query_id", "__cid", "__tables")

    val approx = index.join(broadcast(qProbes), Seq("__cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(
          zip_with(col("__tables"), col("pq_codes"), (t, c) => element_at(t, c + 1)),
          lit(0L), (acc, v) => acc + v).as("approx_dist"))

    val pool = PqAnn.RerankFactor * k
    val cand = Ranking.partialTopK(approx, pool,
        Seq(col("approx_dist"), col("neighbor_id")), rankCol = "__r")
      .select("query_id", "neighbor_id")

    val exact = corpus.select(col(idCol).as("neighbor_id"), quantize(col(vecCol)).as("__cq"))
      .withColumn("__cnorm", sqrt(dotQ(col("__cq"), col("__cq")).cast("double")))
    val qe = queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("__qq"))
      .withColumn("__qnorm", sqrt(dotQ(col("__qq"), col("__qq")).cast("double")))
    val rerank = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    cand
      .join(exact, "neighbor_id")
      .join(broadcast(qe), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        (dotQ(col("__cq"), col("__qq")).cast("double")
          / (col("__cnorm") * col("__qnorm"))).as("cos_sim"))
      .withColumn("rank", row_number().over(rerank)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
  }

  // ---- query-map entry (extra, rows-gated; recall asserted in AnnSpec) ----

  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
    topK(vecs, BruteForceKnn.querySubset(vecs), "vec_id", "embedding", k = 5)
  }
}
