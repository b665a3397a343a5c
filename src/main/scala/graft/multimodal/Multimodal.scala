package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.util.hashing.MurmurHash3

/** Multimodal column plumbing: image/audio/video ride as opaque
  * `binary` columns with typed metadata structs. The Spark-side
  * contract — schema, batched mapPartitions execution (the Scala
  * equivalent of `mapInPandas` batch shape), partition sizing — is real
  * and tested; the actual codec calls are STUBBED with a deterministic
  * fake because no image/audio libraries ship in this container. Swap
  * `FakeCodec` for a real decoder without touching the plumbing.
  */
object Multimodal {

  /** Typed metadata carried next to the binary payload. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("format", StringType, nullable = true), // png|jpg|wav|mp4…
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("size_bytes", LongType, nullable = false)
  ))

  /** DETERMINISTIC FAKE codec — stands in for libjpeg/ffmpeg et al.
    * Derives stable pseudo-features from the payload bytes so every
    * downstream stage (schema, batching, joins, ANN over features) is
    * exercised end-to-end with reproducible values.
    */
  object FakeCodec {
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val h = MurmurHash3.bytesHash(bytes, 7)
      (256 + math.floorMod(h, 1024), 256 + math.floorMod(h >> 10, 1024))
    }

    /** ??? in a real build: image decode + CNN features. Here: a
      * feature hash of the sampled byte content, unit-normalized.
      * The per-sample hash is the first 4 bytes of MD5 over the ASCII
      * "index:byteValue" pair — engine-portable (like HashEmbedder), so
      * the q_media_features DuckDB oracle reconstructs the entire
      * feature vector from the payload bytes. `dim` must be a power of
      * two so signed floorMod == unsigned %.
      */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      require((dim & (dim - 1)) == 0, "dim must be a power of two (engine-portable bucketing)")
      val v = new Array[Float](dim)
      val md = md5Local.get()
      var i = 0
      val step = math.max(1, bytes.length / 512)
      while (i < bytes.length) {
        md.reset()
        val d = md.digest(s"$i:${bytes(i)}".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        val h = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) | ((d(2) & 0xff) << 8) | (d(3) & 0xff)
        v(math.floorMod(h, dim)) += (if ((h & 1) == 0) 1f else -1f)
        i += step
      }
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      if (n > 0) v.map(x => (x / n).toFloat) else v
    }

    private val md5Local = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

    /** Frame sampling stub: returns `n` deterministic frame offsets. */
    def sampleFrameOffsets(durationMs: Long, n: Int): Seq[Long] =
      if (durationMs <= 0 || n <= 0) Seq.empty
      else (0 until n).map(i => durationMs * i / n)
  }

  /** Attach decoded metadata to a binary column. Batched mapPartitions:
    * rows stream through in Arrow-friendly batch shape; per-batch setup
    * cost is amortized exactly where a real codec would want it.
    */
  def withMediaMeta(df: DataFrame, binCol: String, mediaType: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("media_meta", MediaMetaSchema))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val (w, h) = FakeCodec.decodeDims(bytes)
        val meta = Row(mediaType, "fake", w, h, bytes.length.toLong * 10, bytes.length.toLong)
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(Encoders.row(outSchema))
  }

  /** Feature extraction over binary payloads → `features array<float>`,
    * batched like an inference stage (batch boundary = model call).
    */
  def withMediaFeatures(df: DataFrame, binCol: String, dim: Int = 64, batchSize: Int = 32): DataFrame = {
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real model would run one forward pass over this batch
        batch.iterator.map { r =>
          val f = FakeCodec.features(r.getAs[Array[Byte]](binIdx), dim)
          Row.fromSeq(r.toSeq :+ f.toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Read a directory of media files as (path, modificationTime,
    * length, content) via the built-in binaryFile source (S3/S4 shape).
    */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
}
