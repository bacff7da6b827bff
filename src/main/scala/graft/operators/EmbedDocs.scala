package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.Tables

/** Batch text→embedding generation plumbing — the counterpart of the
  * reference's distributed sentence-embedding jobs
  * (/root/reference/DataEngineering/DataBricks/parallel_sentence_embedding_databricks.py:
  * broadcast model + pandas_udf batched encode;
  * /root/reference/MachineLearning/NLP/ray_batch_embedding_generator.py:1-117:
  * actor-per-partition batch encode).
  *
  * The Spark-side plumbing is the real thing: one encoder instantiation
  * per partition (the broadcast-model pattern — model init is expensive,
  * so never per-row), rows accumulated into fixed-size batches, one
  * encode call per batch, results flattened back preserving order. The
  * default encoder is a REAL (if small) embedding model: random
  * projection of the token bag — each token owns a deterministic dense
  * Dim-vector, a text embeds as the normalized sum, so shared vocabulary
  * ⇒ high cosine and the vectors compose linearly (the
  * Johnson-Lindenstrauss-style sparse-to-dense projection; no model
  * runtime needed, stable across JVMs). Swapping in a
  * sentence-transformer changes only the [[EncoderFactory]] passed in.
  *
  * Scale shape: embarrassingly parallel mapPartitions — no shuffle, no
  * driver involvement, output column is `array<float>` ready for the
  * ann/dedup operators; batch size bounds executor memory regardless of
  * partition size.
  */
object EmbedDocs {

  val Dim = 64
  val BatchSize = 64

  /** The model contract: one call per fixed-size batch, mirroring
    * `model.encode(list_of_texts)` (sentence-transformers) /
    * `EmbeddingGenerator.__call__(batch)` (the reference's Ray actor).
    * Must return one vector per input text, in input order. */
  trait BatchEncoder extends Serializable {
    def encodeBatch(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Per-partition model construction — the broadcast-model /
    * actor-init pattern: `create()` runs ONCE per partition on the
    * executor (model load is expensive; never per row or per batch). A
    * real implementation loads the model here; the factory itself is
    * what ships in the closure, not the model. */
  trait EncoderFactory extends Serializable {
    def create(): BatchEncoder
  }

  /** Random-projection-of-BoW encoder: each lowercase whitespace token
    * owns a deterministic dense Dim-vector (components pseudo-uniform in
    * [-1, 1], seeded by the token), a text embeds as the L2-normalized
    * sum over its tokens. Equivalent to projecting the (implicit,
    * vocabulary-sized) BoW count vector through a fixed random matrix —
    * near-identical token bags get near-identical vectors, disjoint
    * vocabularies decorrelate, and composition is linear. Deterministic
    * across JVMs (String.hashCode is JLS-specified; the mixer is ours). */
  object RandomProjectionEncoder extends BatchEncoder {
    import graft.functions.Mix64
    private def mix(z0: Long): Long = Mix64.mix(z0 + Mix64.Golden)

    /** The projection matrix row for one token — public: the spec
      * recomputes expected embeddings from it via an independent
      * count-weighted path. */
    def tokenVector(token: String): Array[Double] = {
      val seed = mix(token.hashCode.toLong)
      Array.tabulate(Dim)(j =>
        (mix(seed + j) >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0)
    }

    def encodeBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val v = new Array[Double](Dim)
      for (tok <- t.toLowerCase.split("\\s+") if tok.nonEmpty) {
        val tv = tokenVector(tok)
        var j = 0
        while (j < Dim) { v(j) += tv(j); j += 1 }
      }
      val norm = math.sqrt(v.map(x => x * x).sum)
      if (norm == 0.0) new Array[Float](Dim) else v.map(x => (x / norm).toFloat)
    }
  }

  object RandomProjectionEncoderFactory extends EncoderFactory {
    def create(): BatchEncoder = RandomProjectionEncoder
  }

  /** A REAL (non-stub) deterministic encoder: signed feature hashing of
    * the token bag ("hashing trick") — each lowercase whitespace token
    * hashes to one of Dim buckets with a ±1 sign, counts accumulate, the
    * result is L2-normalized. Texts sharing vocabulary get high cosine;
    * disjoint vocabularies decorrelate. Zero model state, so `create()`
    * is free — but the factory path is identical to what a
    * sentence-transformer would use. String.hashCode is specified by the
    * JLS, so vectors are stable across JVMs and runs. */
  object HashedBowEncoder extends BatchEncoder {
    import graft.functions.Mix64
    /** (bucket, sign) of a token — public: the pair IS the encoder's
      * deterministic contract, asserted independently in the spec. */
    def bucketAndSign(token: String): (Int, Double) = {
      val h = Mix64.mix(token.hashCode.toLong + Mix64.Golden)
      ((((h >>> 1) % Dim).toInt), if ((h & 1L) == 0L) 1.0 else -1.0)
    }
    def encodeBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val v = new Array[Double](Dim)
      var i = 0
      val toks = t.toLowerCase.split("\\s+")
      while (i < toks.length) {
        if (toks(i).nonEmpty) {
          val (idx, sign) = bucketAndSign(toks(i))
          v(idx) += sign
        }
        i += 1
      }
      val norm = math.sqrt(v.map(x => x * x).sum)
      if (norm == 0.0) new Array[Float](Dim) else v.map(x => (x / norm).toFloat)
    }
  }

  object HashedBowEncoderFactory extends EncoderFactory {
    def create(): BatchEncoder = HashedBowEncoder
  }

  /** Identity-projection degeneracy encoder — the hash gate for the
    * PLUMBING itself: each token maps to the signed-BoW bucket of the
    * SAME poly hash the hash-gated `embed_bow_expr` uses
    * ([[graft.functions.PolyFingerprint]]; bucket = (h div 2) mod 64,
    * sign = 1 − 2·(h mod 2)), totally UNNORMALIZED, with per-bucket
    * token counts carried in the array's upper half so touched-but-
    * zero-sum buckets stay distinguishable (the sparse representation
    * keeps them). Exploding the output reproduces `embed_bow_expr`
    * bit-for-bit, so any batching / ordering / flatten / per-partition-
    * init bug in the mapPartitions path breaks a DuckDB hash instead
    * of a rows-only check. Tokenization is Spark's `split(text, '\\s+')`
    * exactly (limit −1). */
  object SignedBowIntEncoder extends BatchEncoder {
    val BowDim = 64
    def encodeBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      val v = new Array[Float](2 * BowDim)
      for (tok <- t.split("\\s+", -1)) {
        val h = graft.functions.PolyFingerprint.compute(tok)
        val b = ((h / 2) % BowDim).toInt
        v(b) += (1L - 2L * (h % 2)).toFloat
        v(BowDim + b) += 1f
      }
      v
    }
  }

  object SignedBowIntEncoderFactory extends EncoderFactory {
    def create(): BatchEncoder = SignedBowIntEncoder
  }

  /** Append an `embedding array<float>` column computed in batches. */
  def embed(docs: DataFrame, idCol: String, textCol: String,
            factory: EncoderFactory = RandomProjectionEncoderFactory): DataFrame = {
    val spark = docs.sparkSession
    val inSchema = docs.select(idCol, textCol).schema
    val outSchema = StructType(inSchema.fields :+
      StructField("embedding", ArrayType(FloatType), nullable = false))
    val rows = docs.select(idCol, textCol).rdd.mapPartitions { it =>
      val encoder = factory.create() // per-partition model init
      it.grouped(BatchSize).flatMap { batch =>
        val vecs = encoder.encodeBatch(batch.map(_.getString(1)))
        batch.lazyZip(vecs).map((r, v) => Row(r.get(0), r.get(1), v.toSeq))
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  // ---- query-map entry (#26, rows-gated; determinism asserted in spec) ----

  /** The query-map projection keeps only scalar summaries of each vector
    * (dim / norm / component hash) — the raw `array<float>` column breaks
    * the driver's pandas-based result sort, and the array itself is
    * exercised end-to-end by EmbedDocsSpec and the ann/dedup operators.
    *
    * dim and l2_norm are computed inside the same mapPartitions pass as
    * the encoder (plain JVM loops), and vec_hash is `xxhash64` directly
    * on the float array (codegen'd, hashes the numeric values — no
    * dependence on JVM Double.toString formatting). The round-4 form
    * (interpreted aggregate fold + transform + to_json per row) benched
    * 8× slower and its hash was JDK-version-sensitive. */
  def embedDocuments(spark: SparkSession, dir: String): DataFrame =
    embedSummary(spark, dir, RandomProjectionEncoderFactory)

  /** Same summary projection over the REAL hashed-BoW encoder — the
    * driver-gated proof that the factory plumbing runs a non-stub model
    * end-to-end (vector-level semantics asserted in PipelineOpsSpec). */
  def embedDocumentsBow(spark: SparkSession, dir: String): DataFrame =
    embedSummary(spark, dir, HashedBowEncoderFactory)

  /** HASH-gated plumbing twin: [[embed]] (the factory/mapPartitions/
    * batch path the float keys use) under the identity-projection
    * [[SignedBowIntEncoder]], exploded back to (doc_id, dim, val) long
    * rows — output ≡ the hash-gated `embed_bow_expr`, whose DuckDB
    * oracle this key SHARES verbatim. Fences the last rows-gated
    * surface whose plumbing had no hash twin. */
  def embedDocumentsExhaustive(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val d = SignedBowIntEncoder.BowDim
    embed(Tables.documents(spark, dir).select("doc_id", "text"),
        "doc_id", "text", SignedBowIntEncoderFactory)
      .select(col("doc_id"), expr(
        s"""filter(
           |  transform(sequence(0, ${d - 1}), j -> named_struct(
           |    'dim', CAST(j AS BIGINT),
           |    'val', CAST(embedding[j] AS LONG),
           |    'cnt', embedding[j + $d])),
           |  s -> s.cnt > CAST(0 AS FLOAT))""".stripMargin).as("__rows"))
      .select(col("doc_id"), explode(col("__rows")).as("__r"))
      .select(col("doc_id"), col("__r.dim").as("dim"), col("__r.val").as("val"))
  }

  private def embedSummary(spark: SparkSession, dir: String,
                           factory: EncoderFactory): DataFrame = {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val outSchema = StructType(Seq(
      docs.schema("doc_id"),
      StructField("dim", IntegerType, nullable = false),
      StructField("l2_norm", DoubleType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = false)))
    val rows = docs.rdd.mapPartitions { it =>
      val encoder = factory.create() // per-partition model init
      it.grouped(BatchSize).flatMap { batch =>
        val vecs = encoder.encodeBatch(batch.map(_.getString(1)))
        batch.lazyZip(vecs).map { (r, v) =>
          var acc = 0.0
          var i = 0
          while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
          Row(r.get(0), v.length, math.sqrt(acc), v.toSeq)
        }
      }
    }
    spark.createDataFrame(rows, outSchema)
      .select(col("doc_id"), col("dim"),
        round(col("l2_norm"), 6).as("l2_norm"),
        xxhash64(col("embedding")).as("vec_hash"))
  }
}
