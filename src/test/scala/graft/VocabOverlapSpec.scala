package graft

import org.apache.spark.sql.functions._
import graft.functions.VocabGrowth
import graft.operators.StratifiedAte

/** Hand-walked ground truth for the Heaps growth curve and the
  * overlap-weighted ATO. */
class VocabOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("vocab growth: first occurrences credit the right checkpoint") {
    // 10 docs, ids 1..10; doc i holds tokens: "t<i>" (new) and "t1"
    // (repeat) -> at decile d (threshold d): docs=d, tokens=2d, vocab=d
    // except vocab(1)=1 (t1 only doc 1's new token IS t1).
    val docs = (1L to 10L).map(i => (i, if (i == 1) "t1 t1" else s"t$i t1"))
      .toDF("doc_id", "text")
    val got = VocabGrowth.curve(docs, "doc_id", "text")
      .select("decile", "thr_doc_id", "cum_docs", "cum_tokens",
        "cum_vocab", "ttr_permicro")
      .as[(Int, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length === 10)
    got.foreach { case (d, thr, nd, nt, nv, ttr) =>
      assert(thr === d.toLong)
      assert(nd === d.toLong)
      assert(nt === 2L * d)
      assert(nv === (if (d == 1) 1L else d.toLong))
      assert(ttr === nv * 1000000L / nt)
    }
  }

  test("vocab growth: gated deciles are monotone and end at the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val got = VocabGrowth.vocabGrowthDocs(spark, sfDir)
      .orderBy("decile")
      .select("cum_docs", "cum_tokens", "cum_vocab")
      .as[(Long, Long, Long)].collect()
    assert(got.length === 10)
    assert(got.sliding(2).forall(p =>
      p(0)._1 <= p(1)._1 && p(0)._2 <= p(1)._2 && p(0)._3 <= p(1)._3))
    assert(got.last._1 === docs.count())
  }

  test("overlap ATO: two strata, hand-walked weights") {
    // stratum A: t=[10], c=[0] -> delta=10e6, w = (1*1*1000)/2 = 500
    // stratum B: t=[4,4], c=[0,0] -> delta=4e6, w = (2*2*1000)/4 = 1000
    // ATO = (500*10e6 + 1000*4e6)/1500 = 6e6
    val units = Seq(
      ("A", true, 10L), ("A", false, 0L),
      ("B", true, 4L), ("B", true, 4L), ("B", false, 0L), ("B", false, 0L))
      .toDF("stratum", "treated", "y")
    val got = StratifiedAte.overlapAte(units, "stratum", "treated", "y")
      .as[(Long, Long, Long)].head()
    assert(got === ((2L, 1500L, 6000000L)))
  }

  test("overlap ATO: single-arm strata are excluded from the pool") {
    val units = Seq(
      ("A", true, 6L), ("A", false, 0L),
      ("Z", true, 999L)) // no control arm -> excluded
      .toDF("stratum", "treated", "y")
    val got = StratifiedAte.overlapAte(units, "stratum", "treated", "y")
      .as[(Long, Long, Long)].head()
    assert(got === ((1L, 500L, 6000000L)))
  }

  test("overlap ATO: negative effect sign-splits exactly") {
    val units = Seq(("A", true, 0L), ("A", false, 7L), ("A", false, 8L))
      .toDF("stratum", "treated", "y")
    // delta = 0 - 7.5 -> -7500000; w = (1*2*1000)/3 = 666
    val got = StratifiedAte.overlapAte(units, "stratum", "treated", "y")
      .as[(Long, Long, Long)].head()
    assert(got === ((1L, 666L, -7500000L)))
  }
}
