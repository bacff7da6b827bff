package graft

import org.apache.spark.sql.functions._
import graft.dedup.{ExactDedup, MinHashLsh}
import graft.operators.{EmbedDocs, Sampling}
import graft.functions.TextFunctions

/** End-to-end integration: the operators compose into the canonical
  * LLM-training-data curation pipeline on the real documents table —
  * quality filter → exact dedup → near-dup dedup → deterministic split →
  * batched embedding. Asserts the invariants a pipeline owner relies on:
  * monotone shrinkage, no surviving duplicates, schema fitness for the
  * downstream ANN stage, end-to-end determinism. */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("quality->dedup->split->embed composes and preserves invariants") {
    val docs = Tables.documents(spark, sfDir)
    val n0 = docs.count()

    // 1. quality gate: drop the lowest-quality tail
    val quality = TextFunctions.textQuality(spark, sfDir)
      .filter($"quality_score" >= 0.3).select("doc_id")
    val gated = docs.join(quality, "doc_id")
    val n1 = gated.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. exact dedup: keep min doc_id per content hash
    val exact = ExactDedup.dedup(gated, "doc_id", "text")
    val n2 = exact.count()
    assert(n2 <= n1)
    assert(exact.groupBy(sha2($"text", 256)).count().filter($"count" > 1).isEmpty,
      "exact duplicates survived")

    // 3. near-dup dedup: keep component representatives only
    val pairs = MinHashLsh.nearDupPairs(exact, "doc_id", "text", 0.5)
    val reps = MinHashLsh.assignReps(exact, "doc_id", pairs)
    val kept = exact.join(reps.filter($"is_dup" === 0).select("doc_id"), "doc_id")
    val n3 = kept.count()
    assert(n3 <= n2 && n3 > 0)

    // 4. deterministic split + submix compose on the curated corpus
    val split = Sampling.hashSplit(kept, "doc_id",
      Seq("train" -> 0.9, "val" -> 0.1))
    assert(split.count() == n3)

    // 5. batched embedding over the training split feeds the ANN schema
    val train = split.filter($"split" === "train")
    val embedded = EmbedDocs.embed(train, "doc_id", "text")
    val row = embedded.select($"embedding").head()
    assert(row.getSeq[Float](0).length == EmbedDocs.Dim)
    assert(embedded.count() == train.count())

    // end-to-end determinism: rerun from a different partitioning
    val rerun = {
      val g2 = docs.repartition(13).join(quality, "doc_id")
      val e2 = ExactDedup.dedup(g2, "doc_id", "text")
      val p2 = MinHashLsh.nearDupPairs(e2, "doc_id", "text", 0.5)
      val k2 = e2.join(MinHashLsh.assignReps(e2, "doc_id", p2)
        .filter($"is_dup" === 0).select("doc_id"), "doc_id")
      Sampling.hashSplit(k2, "doc_id", Seq("train" -> 0.9, "val" -> 0.1))
        .select("doc_id", "split").as[(Long, String)].collect().toSet
    }
    val first = split.select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(first == rerun, "pipeline is not partitioning-deterministic")
  }

  test("archive ingest front-end: zip corpus -> expand -> curate equals direct curation") {
    import graft.multimodal.ArchiveIngest
    val docs = Tables.documents(spark, sfDir)

    // corpus arrives packed: archives in, member rows out, text restored
    val packed = ArchiveIngest.pack(
      docs.select($"doc_id", encode($"text", "UTF-8").as("payload")),
      "doc_id", "payload", groupSize = 50)
    val restored = ArchiveIngest.expand(packed, "archive_id", "archive")
      .select($"member_name".cast("long").as("doc_id"),
        decode($"member_bytes", "UTF-8").as("text"))

    // the curation front matter (quality + exact dedup) over the restored
    // corpus must equal the same over the original — the archive hop is
    // lossless for the pipeline, not only for byte equality
    def curate(d: org.apache.spark.sql.DataFrame): Set[Long] =
      ExactDedup.dedup(
        TextFunctions.withQuality(d, "text")
          .filter($"quality_score" >= 0.3).select("doc_id", "text"),
        "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet

    assert(curate(restored) == curate(docs.select("doc_id", "text")))
  }

  test("sft export chain: decontaminate -> submix -> shard -> pack composes deterministically") {
    import graft.dedup.Decontaminate
    import graft.operators.TokenPack
    val docs = Tables.documents(spark, sfDir)
    val bench = docs.filter($"doc_id" % 17 === 0)
    val corpus = docs.filter($"doc_id" % 17 =!= 0)

    // 1. scrub benchmark contamination (planted near-dups make real hits)
    val clean = Decontaminate.decontaminate(corpus, bench, "doc_id", "text")
    val nCorpus = corpus.count(); val nClean = clean.count()
    assert(nClean < nCorpus, "no contamination found — scrub untested")
    assert(clean.join(bench, Seq("doc_id")).count() == 0)

    // 2. submix the clean corpus by source strata (monotone shrinkage)
    val mixed = Sampling.submix(clean, "source", "doc_id", Sampling.DemoFracs)
    val nMixed = mixed.count()
    assert(nMixed > 0 && nMixed < nClean)

    // 3. shard the mix: every shard full at 128 except the last,
    //    positions dense inside each shard
    val shards = Sampling.shardAssign(mixed, "doc_id", shardSize = 128L)
      .select($"doc_id", $"shard", $"shard_pos").as[(Long, Long, Long)].collect()
    assert(shards.length == nMixed)
    val byShard = shards.groupBy(_._2)
    val lastShard = byShard.keys.max
    byShard.foreach { case (sh, rows) =>
      assert(rows.length == 128 || sh == lastShard, s"shard $sh not full")
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq)
    }

    // 4. pack the mix into 512-token sequences: offsets inside budget,
    //    pack ids contiguous from 0, monotone in the layout order
    val toks = mixed.select($"doc_id",
      size(TextFunctions.words($"text")).cast("long").as("n_tokens"))
    val packed = TokenPack.pack(toks, "doc_id", "n_tokens", budget = 512L)
      .select($"doc_id", $"n_tokens", $"pack_id", $"pack_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(packed.length == nMixed)
    assert(packed.forall(r => r._4 >= 0 && r._4 < 512))
    val packIds = packed.map(_._3)
    assert(packIds.head == 0 && packIds.sameElements(packIds.sorted))
    assert(packIds.distinct.length == packIds.max + 1, "pack ids not contiguous")
    val totalTokens = packed.map(_._2).sum
    assert(packIds.max == (totalTokens - packed.last._2) / 512,
      "last pack id off the cumulative-token closed form")

    // end-to-end determinism under a different input partitioning
    val again = TokenPack.pack(toks.repartition(11), "doc_id", "n_tokens", 512L)
      .select($"doc_id", $"pack_id", $"pack_offset")
      .as[(Long, Long, Long)].collect().toSet
    assert(again == packed.map(r => (r._1, r._3, r._4)).toSet)
  }

  test("shard export: full fixed-size shards in deterministic shuffled order") {
    // 1030 docs at shard size 100: shards 0..9 full, shard 10 holds 30
    val ids = (0L until 1030L).map(i => i * 7L + 3L) // arbitrary non-dense ids
    val docs = ids.toDF("doc_id")
    val got = Sampling.shardAssign(docs, "doc_id", shardSize = 100L)
      .select("doc_id", "shard", "shard_pos")
      .as[(Long, Long, Long)].collect()
    assert(got.length == 1030)
    val bySh = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySh == (0L to 9L).map(_ -> 100).toMap + (10L -> 30),
      s"shard sizes wrong: $bySh")
    // positions inside each shard are exactly 0..n-1
    got.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"positions in shard $sh not dense")
    }
    // the order is the (portableBucket, id) total order, so the mapping
    // is byte-stable across partitioning
    val expected = ids.sortBy(id =>
        ((((id % 100003L) * 1103515245L + 12345L) % 1000000L + 1000000L) % 1000000L, id))
      .zipWithIndex.map { case (id, i) => (id, i / 100L, i % 100L) }.toSet
    assert(got.map(t => (t._1, t._2, t._3)).toSet == expected)
    val again = Sampling.shardAssign(docs.repartition(13), "doc_id", 100L)
      .select("doc_id", "shard", "shard_pos")
      .as[(Long, Long, Long)].collect().toSet
    assert(again == got.toSet, "shard assignment not partitioning-invariant")
  }

  test("negative sampling: label-0 rows never collide with a user's positives") {
    import graft.operators.NegativeSample
    // user 1 owns most of a 5-item catalog (high collision pressure),
    // user 2 owns one item
    val pos = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L))
      .toDF("user_id", "item_id")
    val ds = NegativeSample.pointwiseDataset(pos, "user_id", "item_id",
        nItems = 5L, k = 3)
      .as[(Long, Long, Int)].collect()
    val posSet = Set((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L))
    val (p, n) = ds.partition(_._3 == 1)
    assert(p.map(r => (r._1, r._2)).toSet == posSet, "positives mangled")
    assert(n.nonEmpty, "no negatives survived")
    n.foreach { case (u, i, _) =>
      assert(!posSet.contains((u, i)), s"negative ($u, $i) collides with a positive")
      assert(i >= 1 && i <= 5, s"negative item $i outside the catalog")
    }
    // <= k distinct negatives per user (dedup + rejection, no resampling)
    n.groupBy(_._1).foreach { case (u, rows) =>
      assert(rows.length <= 3 * posSet.count(_._1 == u),
        s"user $u over-sampled: ${rows.length}")
      assert(rows.map(_._2).distinct.length == rows.length)
    }
    // deterministic under repartitioning
    val again = NegativeSample.pointwiseDataset(pos.repartition(7),
        "user_id", "item_id", 5L, 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(again == ds.toSet, "sampling not partitioning-invariant")
  }

  test("fold hygiene: k-fold splits keep the length distribution (PSI across folds ~ 0)") {
    import graft.operators.{Drift, KFold}
    // the check a CV pipeline runs after splitting: no fold may carry a
    // skewed input distribution, or per-fold metrics stop comparing
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", (length($"text") / 100.0).as("lenv"))
      .withColumn("fold", KFold.foldOf("doc_id", 3))
    def fold(i: Int) = docs.filter($"fold" === i).select("lenv")
    for (i <- 1 to 2) {
      val psiTotal = Drift.psi(fold(0), fold(i), "lenv", bins = 8)
        .agg(sum(abs($"psi_micros"))).head().getLong(0)
      assert(psiTotal < 200000L,
        s"fold $i length distribution drifted vs fold 0: $psiTotal micros")
    }
    // degenerate-skew control: a split BY length would flunk the same test
    val bad0 = docs.orderBy($"lenv").limit(150).select("lenv")
    val bad1 = docs.orderBy($"lenv".desc).limit(150).select("lenv")
    val badPsi = Drift.psi(bad0, bad1, "lenv", bins = 8)
      .agg(sum(abs($"psi_micros"))).head().getLong(0)
    assert(badPsi > 1000000L, s"control skew not detected: $badPsi")
  }
}
