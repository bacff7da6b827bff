package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic integer k-means over a BOUNDED training sample, run in
  * the driver — the index-training shape FAISS itself uses (train on
  * ~40·k sampled points single-node, then assign the corpus
  * distributed; /root/reference/MachineLearning/ML/performant_faiss.py
  * trains its `IVF65536,PQ8x8` index exactly this way).
  *
  * Earlier rounds trained with distributed k-means over a FRACTION of
  * the corpus (TrainFrac = 50%): at 100 TB that is 50 TB re-scanned per
  * iteration across 5 collect-barrier jobs — training cost grew with
  * corpus size for no recall benefit beyond the statistics a fixed-size
  * sample already carries. Now: ONE TakeOrdered job collects the sample
  * (rows with the smallest (xxhash64(id), id) — deterministic and
  * partitioning-invariant), and every k-means iteration is pure driver
  * arithmetic — no job, no plan compile, no function-registration churn.
  *
  * All math is exact integer arithmetic (quantized coordinates, floor
  * division for means, ties to the lower centroid id), so centroids are
  * bit-identical across runs, partitionings, and cluster sizes.
  */
private[ann] object Kmeans {

  /** FAISS-style bound: ~40 points per centroid, clamped so tiny k still
    * sees enough data and huge k cannot blow the driver. */
  def trainPoints(k: Int): Int =
    math.min(math.max(40 * k, 2000), 200000)

  /** The n sample rows with smallest (xxhash64(idCol), idCol), as arrays.
    * A global TakeOrdered — one bounded job, no full sort. */
  def sampleQ(q: DataFrame, idCol: String, qCol: String, n: Int): Array[Array[Long]] =
    q.orderBy(xxhash64(col(idCol)), col(idCol)).limit(n)
      .select(qCol).collect().map(_.getSeq[Long](0).toArray)

  /** Lloyd iterations over the sample; seeds are the first k sample rows
    * (lowest-hash — spread and reproducible). Empty clusters keep their
    * centroid, exactly like the distributed version did. */
  def fit(points: Array[Array[Long]], k: Int, iters: Int): Array[Array[Long]] = {
    require(points.nonEmpty, "k-means needs a non-empty training sample")
    val kk = math.min(k, points.length)
    var cents = points.take(kk).map(_.clone)
    val dim = points(0).length
    for (_ <- 1 to iters) {
      val sums = Array.ofDim[Long](kk, dim)
      val counts = new Array[Long](kk)
      var pi = 0
      while (pi < points.length) {
        val p = points(pi)
        var best = 0
        var bestD = Long.MaxValue
        var c = 0
        while (c < kk) {
          val cent = cents(c)
          var d = 0L
          var i = 0
          while (i < dim) { val df = p(i) - cent(i); d += df * df; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
        pi += 1
      }
      cents = Array.tabulate(kk) { c =>
        if (counts(c) == 0) cents(c)
        else {
          val out = new Array[Long](dim)
          var i = 0
          while (i < dim) { out(i) = sums(c)(i) / counts(c); i += 1 }
          out
        }
      }
    }
    cents
  }

  /** Nearest centroid id for one point (ties to the lower id) — the
    * driver-side twin of the compiled PqAssign/NearestCentroids kernels. */
  def nearest(p: Array[Long], cents: Array[Array[Long]]): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0L
      var i = 0
      while (i < p.length) { val df = p(i) - cent(i); d += df * df; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }
}
