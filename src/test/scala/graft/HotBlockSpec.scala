package graft

import graft.dedup._
import org.apache.spark.sql.functions._

/** Hot-block scale contracts for the blocking-based dedup joins (the
  * round-13 verdict's two flagged scale hazards):
  *
  *  - [[EditDistance]]: a half-prefix block shared by > blockCap docs
  *    (boilerplate opening) is DROPPED from candidate generation — the
  *    declared recall bound that keeps per-block join work ≤ blockCap².
  *  - [[SimHashDedup]]: identical fingerprints (exact dup clusters)
  *    band as ONE distinct-fp row, so band-bucket occupancy — and the
  *    candidate join — is independent of dup-cluster size.
  */
class HotBlockSpec extends SparkSpec {
  import spark.implicits._

  // --- EditDistance: boilerplate half-prefix corpus -------------------

  // 200 docs share the first half "AAAAAAAA" (hot: df=200 > cap=10) with
  // unique second halves; one planted pair shares a COLD second-half
  // block ("CCCCCCCC", df=2) with first halves one substitution apart.
  private def hotCorpus = {
    val boiler = (1 to 200).map(i => (i.toLong, f"AAAAAAAA$i%08d padding"))
    val planted = Seq(
      (1001L, "DDDDDD01CCCCCCCC padding"),
      (1002L, "DDDDDD02CCCCCCCC padding"))
    (boiler ++ planted).toDF("doc_id", "text")
  }

  test("editdist cap drops hot half-prefix blocks, keeps cold-block recall") {
    val cap = 10
    val cand = EditDistance.candidatePairs(hotCorpus, "doc_id", "text",
      prefixLen = 16, blockCap = cap)
    // uncapped, the hot block alone would admit 200*199/2 = 19900
    // candidates; capped, only the planted cold-block pair survives
    assert(cand.count() === 1L,
      "hot-block candidates leaked past the df-cap")
    val pairs = EditDistance.nearPairs(hotCorpus, "doc_id", "text",
      prefixLen = 16, blockCap = cap)
      .select("a_id", "b_id", "lev").as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((1001L, 1002L, 1)),
      "cold-block planted pair must be found exactly")
  }

  test("editdist declared FN: pair agreeing only on a hot block is not surfaced") {
    // doc 1 and 2 of the boilerplate block are lev-1 in their prefixes
    // ("AAAAAAAA00000001" vs "AAAAAAAA00000002") but share ONLY the hot
    // first-half block — the declared recall bound excludes them
    val all = EditDistance.nearPairs(hotCorpus, "doc_id", "text",
      prefixLen = 16, blockCap = 10)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(!all.contains((1L, 2L)), "hot-only pair should be excluded by contract")
    // with a cap above the block size the same pair IS found (recall
    // is a function of the declared cap, not lost capability)
    val uncapped = EditDistance.nearPairs(hotCorpus, "doc_id", "text",
      prefixLen = 16, blockCap = 100000)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L)))
  }

  // --- SimHash: exact-dup cluster corpus ------------------------------

  private val textA = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val textB = textA.replace("sigma", "sygma") // near-dup of A
  private val far = "one two three four five six seven eight nine ten " +
    "eleven twelve thirteen fourteen fifteen sixteen seventeen"

  private def dupCorpus(copies: Int) = {
    val dups = (1 to copies).map(i => (i.toLong, textA))
    val rest = Seq((9001L, textB), (9002L, far))
    (dups ++ rest).toDF("doc_id", "text")
  }

  test("simhash fp-level banding is independent of dup-cluster size") {
    val few = SimHashDedup.fingerprints(dupCorpus(2), "doc_id", "text")
    val many = SimHashDedup.fingerprints(dupCorpus(100), "doc_id", "text")
    val candFew = SimHashDedup.fpCandidatePairs(few).count()
    val candMany = SimHashDedup.fpCandidatePairs(many).count()
    assert(candFew === candMany,
      "fp-level candidate count must not scale with exact-dup copies")
    // the fp join never exceeds distinct-fp pairs: 3 distinct fps here
    assert(candMany <= 3L)
  }

  test("simhash component path collapses a dup cluster via linear edges") {
    val docs = dupCorpus(50)
    val out = SimHashDedup.components(docs, "doc_id", "text")
    val reps = out.select("doc_id", "rep_id", "is_dup")
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // all 50 exact copies collapse to rep 1 (hamming 0 by construction)
    (2L to 50L).foreach(i => assert(reps(i) == ((1L, 1))))
    assert(reps(1L) == ((1L, 0)))
    // the other two docs: membership must match brute-force hamming
    val fps = SimHashDedup.fingerprints(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    Seq(9001L, 9002L).foreach { id =>
      val joins = java.lang.Long.bitCount(fps(id) ^ fps(1L)) <= SimHashDedup.HammingMax
      if (joins) assert(reps(id) == ((1L, 1)), s"$id should join cluster 1")
      else assert(reps(id) == ((id, 0)), s"$id should stay its own entity")
    }
  }

  test("simhash pair output unchanged by the distinct-fp rewrite") {
    val docs = dupCorpus(4)
    val fp = SimHashDedup.fingerprints(docs, "doc_id", "text")
    val got = SimHashDedup.nearDupPairsFromFp(fp)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Int)].collect().toSet
    val fps = fp.as[(Long, Long)].collect()
    val want = (for {
      (ai, af) <- fps; (bi, bf) <- fps
      if ai < bi && java.lang.Long.bitCount(af ^ bf) <= SimHashDedup.HammingMax
    } yield (ai, bi, java.lang.Long.bitCount(af ^ bf))).toSet
    assert(got === want)
  }
}
