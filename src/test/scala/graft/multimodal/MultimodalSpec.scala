package graft.multimodal

import graft.SparkTestBase
import graft.search.VectorSearch
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class MultimodalSpec extends SparkTestBase {

  private def mediaDf = {
    import spark.implicits._
    Seq(
      (1L, Array.fill[Byte](2048)(3)),
      (2L, Array.fill[Byte](4096)(7)),
      (3L, "small".getBytes)
    ).toDF("media_id", "payload")
  }

  test("media metadata attaches typed struct; deterministic fake decode") {
    val out = Multimodal.withMediaMeta(mediaDf, "payload", "image")
    val rows = out.collect()
    assert(rows.length == 3)
    val meta = rows.head.getStruct(2)
    assert(meta.getAs[String]("media_type") == "image")
    assert(meta.getAs[Long]("size_bytes") == 2048L)
    assert(meta.getAs[Int]("width") >= 256 && meta.getAs[Int]("height") >= 256)
    // determinism: same bytes → same dims
    val again = Multimodal.withMediaMeta(mediaDf, "payload", "image").collect().head.getStruct(2)
    assert(again == meta)
  }

  test("feature extraction: unit-norm vectors, batched, ANN-composable") {
    val out = Multimodal.withMediaFeatures(mediaDf, "payload", dim = 32, batchSize = 2)
    val rows = out.collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](2)
      assert(v.length == 32)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(n == 0.0 || math.abs(n - 1.0) < 1e-5)
    }
    // features feed straight into the vector search operators
    val q = rows.head.getSeq[Float](2).toArray
    val top = VectorSearch.topK(out.withColumnRenamed("features", "embedding"), q, 2)
    assert(top.collect().head.getAs[Long]("media_id") == 1L)
  }

  test("frame sampling stub is deterministic and bounded") {
    assert(Multimodal.FakeCodec.sampleFrameOffsets(10000, 4) == Seq(0L, 2500L, 5000L, 7500L))
    assert(Multimodal.FakeCodec.sampleFrameOffsets(0, 4).isEmpty)
    assert(Multimodal.FakeCodec.sampleFrameOffsets(10000, 0).isEmpty)
  }

  test("binaryFile directory read exposes path/mtime/length/content (S3 shape)") {
    val dir = Files.createTempDirectory("graft-media").toString
    Files.write(Paths.get(s"$dir/a.bin"), Array.fill[Byte](128)(1))
    Files.write(Paths.get(s"$dir/b.bin"), Array.fill[Byte](256)(2))
    val df = Multimodal.readBinaryDir(spark, dir, "*.bin")
    val rows = df.orderBy("path").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Long]("length")).toSeq == Seq(128L, 256L))
    assert(df.columns.toSet == Set("path", "modificationTime", "length", "content"))
  }
}
