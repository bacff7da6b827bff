package graft

import org.apache.spark.sql.functions._
import graft.operators.Kendall
import graft.ann.MutualKnn

class KendallMutualSpec extends SparkSpec {
  import spark.implicits._

  test("kendall: perfect monotone gives tau_a = 1, reversal gives -1") {
    val up = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    val got = Kendall.tauCounts(up, "x", "y")
      .select($"tau_a_permicro").as[Long].head()
    assert(got === 1000000L)
    val down = Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("x", "y")
    assert(Kendall.tauCounts(down, "x", "y")
      .select($"tau_a_permicro").as[Long].head() === -1000000L)
  }

  test("kendall: tie decomposition partitions all pairs") {
    // 4 points incl. duplicates and partial ties
    val df = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L)).toDF("x", "y")
    val r = Kendall.tauCounts(df, "x", "y")
      .select($"n", $"concordant".cast("long"), $"discordant".cast("long"),
        $"ties_x".cast("long"), $"ties_y".cast("long"), $"ties_xy".cast("long"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val (n, c, d, tx, ty, txy) = r
    // total pairs = C + D + cross-cell ties_x + cross-cell ties_y + within-cell
    assert(n === 4L)
    assert(c + d + tx + ty + txy === n * (n - 1) / 2)
  }

  test("mutual knn: hand geometry keeps reciprocal pairs only") {
    // a,b colinear (mutual top-1); c near them; d far away on another axis
    val vecs = Seq(
      (1L, Array(1.0f, 0f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f, 0f)),
      (3L, Array(0.8f, 0.3f, 0f, 0f)),
      (4L, Array(0f, 0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val got = MutualKnn.mutualPairs(vecs, "vec_id", "embedding", k = 1)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // quantized ints: 1=(1000,0), 2=(899,100), 3=(800,300) -> cos(2,1)=.9939
    // beats cos(2,3)=.9693 and cos(1,3)=.9363: 1 and 2 pick each other,
    // 3 picks 2 unreciprocated, 4 is orthogonal to everything
    assert(got === Set((1L, 2L)))
  }

  test("mutual knn gated instance: pairs are canonical and ranks within k") {
    val got = MutualKnn.mutualKnnEmbeddings(spark, sfDir)
    assert(got.filter($"a_id" >= $"b_id").isEmpty)
    assert(got.filter($"rank_ab" > 3 || $"rank_ba" > 3).isEmpty)
  }
}
