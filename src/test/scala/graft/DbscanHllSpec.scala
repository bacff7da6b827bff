package graft

import org.apache.spark.sql.functions._
import graft.operators.Dbscan
import graft.functions.Hll

class DbscanHllSpec extends SparkSpec {
  import spark.implicits._

  test("dbscan: hand geometry separates core, border, noise") {
    // square cluster (pairwise dist² ≤ 200), one border, one outlier
    val pts = Seq(
      (1L, 0L, 0L), (2L, 10L, 0L), (3L, 0L, 10L), (4L, 10L, 10L),
      (5L, 25L, 0L),  // within 20 of point 2 only → border
      (6L, 60L, 0L)   // nothing within 20 → noise
    ).toDF("id", "x", "y")
    val got = Dbscan.classify(pts, "id", "x", "y", epsMilli = 20L, minPts = 4L)
      .select($"id", $"n_neighbors", $"cls")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got.map(_._3).toSeq ===
      Seq("core", "core", "core", "core", "border", "noise"))
    assert(got(0)._2 === 4L) // the 4 square points see each other
    assert(got(4)._2 === 3L) // border: itself + points 2 and 4 (dist² 325)
    assert(got(5)._2 === 1L) // noise: itself only
  }

  test("dbscan: neighbors found across cell boundaries incl. negatives") {
    // (-1,-1) and (1,1) straddle the origin cell corner; dist² = 8
    val pts = Seq((1L, -1L, -1L), (2L, 1L, 1L)).toDF("id", "x", "y")
    val got = Dbscan.classify(pts, "id", "x", "y", epsMilli = 60L, minPts = 2L)
      .select($"id", $"cls").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "core", 2L -> "core"))
  }

  test("dbscan gated instance: all classes covered, counts bounded") {
    val got = Dbscan.dbscanEmbeddings(spark, sfDir)
      .groupBy($"cls").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got.getOrElse("core", 0L) > 0L)
    assert(got.values.sum === 500L)
  }

  test("hll: register spine is complete and estimate lands near truth") {
    val df = (1L to 500L).toDF("k")
    val rows = Hll.sketch(df, "k")
    assert(rows.count() === 64L)
    val est = rows.select($"est_micro").as[Long].head() / 1e6
    assert(est > 325 && est < 675, s"estimate $est vs truth 500")
  }

  test("hll: single key estimates 1 via linear counting") {
    val one = Seq(42L).toDF("k")
    val r = Hll.sketch(one, "k")
      .select($"n_zero", $"est_micro").as[(Long, Long)].head()
    assert(r._1 === 63L)
    // m·ln(m/63) micros ≈ 1.007874 — linear counting resolves tiny sets
    assert(r._2 === Hll.LinearCountMicro(62)._2)
  }

  test("hll: registers merge by max (sketch of union = max of sketches)") {
    val a = (1L to 200L).toDF("k"); val b = (150L to 400L).toDF("k")
    val ra = Hll.sketch(a, "k").select($"bucket", $"register".as("ra"))
    val rb = Hll.sketch(b, "k").select($"bucket", $"register".as("rb"))
    val merged = ra.join(rb, "bucket")
      .select($"bucket", greatest($"ra", $"rb").as("register"))
    val direct = Hll.sketch((1L to 400L).toDF("k"), "k")
      .select($"bucket", $"register")
    assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty)
  }
}
