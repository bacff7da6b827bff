package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.dedup._

/** Planted-ground-truth specs for the near-dup dedup family (#27–31).
  *
  * The probabilistic paths (MinHash LSH, SimHash) are rows-gated by the
  * driver, so these specs carry their semantic guarantees: planted
  * near-identical pairs MUST be found, unrelated docs MUST NOT pair.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches " +
      "from the warm windowsill and the birds sing in the garden trees " +
      "as morning light spreads slowly across the quiet village square"
  // near-dup of base: one word changed
  private val nearDup = base.replace("quiet village", "busy village")
  private val unrelated =
    "stock prices fell sharply on tuesday after the central bank raised " +
      "interest rates again citing persistent inflation concerns among " +
      "manufacturers and retailers across several key economic sectors"

  private def docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated), (4L, base)
  ).toDF("doc_id", "text")

  test("minhash lsh finds planted near-dup and exact dup, skips unrelated") {
    val pairs = MinHashLsh.nearDupPairs(docs, "doc_id", "text", 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "planted near-dup (1,2) not found")
    assert(pairs.contains((1L, 4L)), "exact dup (1,4) not found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc paired")
  }

  test("rep assignment collapses transitive chains to one component keeper") {
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val reps = MinHashLsh.assignReps(nodes, "doc_id", pairs)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(reps == Map(
      1L -> ((1L, 0)), 2L -> ((1L, 1)), 3L -> ((1L, 1)), // chain 1-2-3: all -> 1
      4L -> ((4L, 0)),                                   // isolated
      5L -> ((5L, 0)), 6L -> ((5L, 1))))
  }

  test("minhash rep assignment picks min neighbor, flags dups") {
    val pairs = MinHashLsh.nearDupPairs(docs, "doc_id", "text", 0.5)
    val reps = MinHashLsh.assignReps(docs, "doc_id", pairs)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(reps(1L) == (1L, 0))
    assert(reps(2L) == (1L, 1))
    assert(reps(3L) == (3L, 0))
    assert(reps(4L) == (1L, 1))
  }

  test("simhash hamming distance 0 for identical, <=3 for near-dup, large for unrelated") {
    val fps = docs.select($"doc_id", SimHashDedup.simhash($"text").as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(4L), "identical texts must have identical simhash")
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(3L)) > SimHashDedup.HammingMax,
      "unrelated docs within hamming band")
    val pairs = SimHashDedup.nearDupPairs(docs, "doc_id", "text")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), "exact dup (1,4) not found by simhash")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc paired")
  }

  test("simhash block tables: pair output identical to brute-force hamming<=3") {
    // deterministic pseudo-random fingerprints + planted near-pairs whose
    // 3 flipped bits land in 3 DIFFERENT blocks (the adversarial case for
    // block agreement: exactly BlockCount−3 blocks left agreeing)
    def mix(x: Long): Long = { // splitmix64 finalizer
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val rnd = (0L until 300L).map(i => (i, mix(i)))
    val planted = Seq(
      (1000L, mix(7L) ^ (1L << 5) ^ (1L << 20) ^ (1L << 60)), // blocks 0,1,5
      (1001L, mix(7L) ^ (1L << 43)),                          // 1 bit, block 3
      (1002L, mix(7L)))                                       // exact dup of base 7
    val all = rnd ++ planted
    val fp = all.toDF("__id", "__fp")
    val got = SimHashDedup.nearDupPairsFromFp(fp)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    val want = (for {
      (ai, af) <- all; (bi, bf) <- all if ai < bi
      if java.lang.Long.bitCount(af ^ bf) <= SimHashDedup.HammingMax
    } yield (ai, bi)).toSet
    assert(want.contains((7L, 1000L)) && want.contains((7L, 1002L)),
      "fixture must plant cross-block near pairs")
    assert(got == want, s"recall/precision mismatch: got $got want $want")
  }

  test("simhash block tables admit far fewer candidates than raw 16-bit bands") {
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val fp = (0L until 2000L).map(i => (i, mix(i))).toDF("__id", "__fp")
    val newCand = SimHashDedup.candidatePairs(fp).count()
    // the retired scheme: raw 16-bit band values as bucket keys
    import org.apache.spark.sql.functions._
    val bands = fp.select(col("__id"), explode(array(Seq.tabulate(4) { j =>
      struct(lit(j).as("i"),
        shiftright(col("__fp"), 16 * j).bitwiseAND(lit(0xFFFFL)).as("v"))
    }: _*)).as("b"))
    val oldCand = bands.as("a").join(bands.as("b"),
        col("a.b") === col("b.b") && col("a.__id") < col("b.__id"))
      .select("a.__id", "b.__id").distinct().count()
    // 2000 random fps: raw bands collide by birthday on 65,536 buckets;
    // 32-bit combination keys essentially never do
    assert(oldCand > 20, s"old banding admitted only $oldCand — fixture too small")
    assert(newCand * 10 < oldCand,
      s"block tables admit $newCand candidates vs $oldCand for raw bands")
  }

  test("ngram jaccard exact pairs match brute-force ground truth") {
    val got = NGramJaccard.similarPairs(docs, "doc_id", "text", 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // brute-force ground truth over the 4 docs
    def sh(t: String) = t.split("\\s+").sliding(3).map(_.mkString(" ")).toSet
    val all = Seq(1L -> base, 2L -> nearDup, 3L -> unrelated, 4L -> base)
    val want = (for {
      (ai, at) <- all; (bi, bt) <- all if ai < bi
      j = sh(at).intersect(sh(bt)).size.toDouble / sh(at).union(sh(bt)).size
      if j >= 0.5
    } yield (ai, bi)).toSet
    assert(got == want, s"got $got want $want")
  }

  test("embedding cosine pairs: identical vectors ~1.0, orthogonal excluded") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = Seq(
      Row(1L, Seq(1.0f, 2.0f, 3.0f, 0.5f)),
      Row(2L, Seq(1.0f, 2.0f, 3.0f, 0.5f)),   // identical to 1
      Row(3L, Seq(1.0f, 2.1f, 2.9f, 0.4f)),   // near 1
      Row(4L, Seq(-3.0f, 1.0f, 0.0f, 2.0f)))  // far from all
    val vecs = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val pairs = EmbeddingDedup.similarPairs(vecs, "vec_id", "embedding", 0.95)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
  }

  test("bucketed embedding dedup finds all planted near-dups, subset of exact") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    // 40 scattered vectors + 3 planted near-identical groups
    val base = (0 until 40).map { i =>
      Row(i.toLong, Seq.tabulate(64)(j =>
        (math.sin(i * 64 + j) * 2).toFloat))
    }
    val planted = Seq(0, 1, 2).flatMap { g =>
      val v = Seq.tabulate(64)(j => (math.cos(g * 64 + j) * 2).toFloat)
      Seq(Row(100L + g, v), Row(200L + g, v.map(x => x * 1.001f))) // cos ~ 1
    }
    val vecs = spark.createDataFrame(
      spark.sparkContext.parallelize(base ++ planted), schema)
    val approx = EmbeddingDedup.similarPairsApprox(vecs, "vec_id", "embedding", 0.99)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val exact = EmbeddingDedup.similarPairs(vecs, "vec_id", "embedding", 0.99)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(approx.subsetOf(exact), "approx produced a pair exact did not")
    Seq(0L, 1L, 2L).foreach { g =>
      assert(approx.contains((100L + g, 200L + g)), s"planted near-dup group $g missed")
    }
  }

  test("exact dedup keeps min id per content group") {
    val g = ExactDedup.groups(docs, "doc_id", "text")
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toSet
    assert(g == Set((1L, 2L), (2L, 1L), (3L, 1L)))
    val kept = ExactDedup.dedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }
}
