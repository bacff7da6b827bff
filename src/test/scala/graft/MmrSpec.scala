package graft

import org.apache.spark.sql.functions._
import graft.ann.MmrRerank

class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("mmr: redundant near-duplicate is demoted below a diverse pick") {
    // A and B nearly identical and most relevant; C orthogonal, less
    // relevant. Pure relevance ranks A,B,C; MMR must pick A then C.
    val cands = Seq(
      (1L, Array(1.0f, 0.0f, 0f, 0f)),        // A
      (2L, Array(0.999f, 0.0f, 0f, 0f)),      // B ≈ A, slightly weaker
      (3L, Array(0.0f, 0.6f, 0f, 0f))         // C orthogonal, weaker
    ).toDF("vec_id", "embedding")
    val probe = Seq((9L, Array(1.0f, 0.2f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = MmrRerank.rerank(cands, probe, "vec_id", "embedding", k = 3)
      .orderBy($"rank").select($"vec_id").as[Long].collect().toSeq
    assert(got === Seq(1L, 3L, 2L))
  }

  test("mmr: first pick is the pure-relevance argmax with id tie-break") {
    val cands = Seq(
      (5L, Array(0.5f, 0f, 0f, 0f)),
      (2L, Array(0.5f, 0f, 0f, 0f)), // identical relevance, lower id
      (7L, Array(0.1f, 0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val probe = Seq((9L, Array(1.0f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val got = MmrRerank.rerank(cands, probe, "vec_id", "embedding", k = 1)
      .select($"vec_id").as[Long].head()
    assert(got === 2L)
  }

  test("mmr gated instance: k distinct picks, ranks dense") {
    val got = MmrRerank.mmrEmbeddings(spark, sfDir)
      .select($"rank", $"vec_id").as[(Int, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === (1 to 5))
    assert(got.map(_._2).distinct.length === 5)
    assert(got.forall(_._2 < 20L))
  }
}
