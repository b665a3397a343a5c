package graft.embed

import graft.model.EmbeddingConfig
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.sql.types.{ArrayType, FloatType, StructField, StructType}

/** Embedding surface (reference embeddings.py:32-48). The reference wraps
  * a SentenceTransformer; this build is zero-egress so the production
  * model is replaced by a deterministic stand-in behind the same trait —
  * dim, L2 normalization, batching, and per-executor lazy singleton
  * semantics are all real and tested (SURVEY.md §2.4 E1-E4).
  */
trait Embedder extends Serializable {
  def dim: Int

  /** E2 — single text → unit-norm vector. */
  def embed(text: String): Array[Float]

  /** E1 — batched encode; the batch boundary is where a real model would
    * amortize inference (batch_size=32, config.py:57).
    */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map(embed)
}

/** Deterministic feature-hashed char-3-gram embedder. Signed feature
  * hashing into `dim` buckets, then L2 normalization (E3) so cosine ≡
  * dot product, matching the reference's normalize_embeddings=True
  * contract (embeddings.py:36).
  *
  * The n-gram hash is the first 4 bytes (big-endian) of MD5 over UTF-8
  * — engine-portable on purpose: any engine with md5() reproduces the
  * signed value exactly, and because `dim` is a power of two,
  * floorMod(signed, dim) == unsigned % dim, so the DuckDB correctness
  * oracle rebuilds whole embeddings (and cosine top-k over them)
  * bit-for-bit. Bucket counts are small integers, so the squared norm
  * is exact and the normalized components are deterministic regardless
  * of accumulation order. MD5 per n-gram costs ~10× a murmur mix; at
  * ~one hash per character it is still noise next to any real model.
  */
final class HashEmbedder(val dim: Int = 1024, ngram: Int = 3)
    extends Embedder {
  require((dim & (dim - 1)) == 0, "dim must be a power of two (keeps the hash bucket engine-portable)")

  override def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    val s = "\u0002" + (if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT)) + "\u0003"
    val md = HashEmbedder.md5Local.get()
    var i = 0
    val n = s.length
    while (i + ngram <= n) {
      md.reset()
      val d = md.digest(s.substring(i, i + ngram).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) | ((d(2) & 0xff) << 8) | (d(3) & 0xff)
      val idx = math.floorMod(h, dim)
      v(idx) += (if ((h & Int.MinValue) == 0) 1f else -1f)
      i += 1
    }
    // E3 — L2 normalize (unit vector); all-zero stays all-zero
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += v(j).toDouble * v(j).toDouble; j += 1 }
    if (ss > 0) {
      val inv = (1.0 / math.sqrt(ss))
      j = 0
      while (j < dim) { v(j) = (v(j) * inv).toFloat; j += 1 }
    }
    v
  }
}

object HashEmbedder {
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

object Embedders {
  /** E4 — per-executor lazy singleton (mirrors the reference's module
    * singleton, embeddings.py:56-64). A real model would load here once
    * per executor JVM; the hash embedder is cheap but keeps the shape.
    */
  @transient lazy val default: Embedder = new HashEmbedder(EmbeddingConfig.default.dim)

  /** Column form for plan-friendly composition (scalar UDF). Marked
    * non-deterministic (though pure) so the optimizer never duplicates
    * the embedding computation into derived predicates — same
    * rationale as Chunker.chunksArray.
    */
  def embedUdf(embedder: Embedder): Column => Column = {
    val f = udf { (s: String) => embedder.embed(s) }.asNondeterministic()
    c => f(c)
  }

  /** mapPartitions form: batches of `batchSize` per model call — the
    * architecture a heavyweight model needs (E1/O6). Appends
    * `embedding: array<float>` computed from `textCol`.
    */
  def withEmbedding(
      df: DataFrame,
      textCol: String,
      outCol: String = "embedding",
      embedder: Embedder = Embedders.default,
      batchSize: Int = EmbeddingConfig.default.batchSize
  ): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, ArrayType(FloatType), nullable = false))
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = embedder.embedBatch(batch.map(r => Option(r.getString(textIdx)).getOrElse("")))
        batch.iterator.zip(vecs.iterator).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ v.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }
}
