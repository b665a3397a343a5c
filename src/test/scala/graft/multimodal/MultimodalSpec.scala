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

  test("media metadata attaches typed struct; unknown payloads carried as opaque bin") {
    val out = Multimodal.withMediaMeta(mediaDf, "payload", "image")
    val rows = out.collect()
    assert(rows.length == 3)
    val meta = rows.head.getStruct(2)
    assert(meta.getAs[String]("media_type") == "image")
    assert(meta.getAs[Long]("size_bytes") == 2048L)
    // raw fill bytes are no known container: sniffed as opaque bin, null dims
    assert(meta.getAs[String]("format") == "bin")
    assert(meta.isNullAt(meta.fieldIndex("width")) && meta.isNullAt(meta.fieldIndex("height")))
  }

  test("MediaSniffer: real containers are identified from their actual headers") {
    import Multimodal.MediaSniffer
    val png = MediaSniffer.sniff(Multimodal.ImageCodec.encodePng(12, 9, 3))
    assert(png == MediaSniffer.Sniffed("png", Some(12), Some(9), None))
    val wav = MediaSniffer.sniff(Multimodal.AudioCodec.encodeWav(800, 8000, 5))
    assert(wav.format == "wav" && wav.durationMs.contains(100L)) // 800·2 bytes / 16000 B/s
    val avi = MediaSniffer.sniff(VideoCodec.encodeAviMjpeg(3, 2, 4, 10, 7))
    assert(avi == MediaSniffer.Sniffed("avi", Some(24), Some(16), Some(400L)))
    // a bare JPEG frame: SOF dims read by the marker walk
    val jpg = MediaSniffer.sniff(VideoCodec.encodeJpegFrame(3, 2, 0, 7))
    assert(jpg == MediaSniffer.Sniffed("jpeg", Some(24), Some(16), None))
    assert(MediaSniffer.sniff("not media".getBytes).format == "bin")
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

  test("ImageCodec: PNG encode→imageio decode roundtrip matches the closed-form pixels") {
    for ((w, h, seed) <- Seq((8, 8, 0), (16, 11, 437), (9, 14, 999), (1, 1, 123))) {
      val bytes = Multimodal.ImageCodec.encodePng(w, h, seed)
      // a real PNG container, not a hash-fake
      assert(bytes.take(4).toSeq == Seq[Byte](0x89.toByte, 0x50, 0x4e, 0x47))
      val st = Multimodal.ImageCodec.decodeStats(bytes)
      assert(st.width == w && st.height == h)
      def mean(f: (Int, Int, Int) => Int): Double =
        (for (x <- 0 until w; y <- 0 until h) yield f(x, y, seed).toLong).sum / (w.toLong * h).toDouble
      assert(st.meanR == mean(Multimodal.ImageCodec.pixelR))
      assert(st.meanG == mean(Multimodal.ImageCodec.pixelG))
      assert(st.meanB == mean(Multimodal.ImageCodec.pixelB))
    }
  }

  test("ImageCodec: golden PNG bytes decode to pinned stats (imageio behavior lock)") {
    // 2×2 gradient, seed 5 — bytes produced by encodePng on the dev
    // machine and frozen here so a JDK/imageio behavior change (or an
    // encode regression) fails loudly rather than silently shifting
    // every downstream feature.
    val golden = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAIAAAACCAIAAAD91JpzAAAAFklEQVR4XmNg5ZJUEZRhEBM3M5WzBAAHngFp+Z9bCAAAAABJRU5ErkJggg==")
    val st = Multimodal.ImageCodec.decodeStats(golden)
    assert(st == Multimodal.ImageCodec.ImageStats(2, 2, 29.0, 20.0, 41.0, 116L, 80L, 164L))
    // and today's encoder still produces byte-identical output
    assert(Multimodal.ImageCodec.encodePng(2, 2, 5).toSeq == golden.toSeq)
  }

  test("withEncodedPng + withImageStats: distributed real decode matches driver-side decode") {
    import spark.implicits._
    val dims = Seq((1L, 8, 9, 42), (2L, 12, 8, 7), (3L, 16, 14, 500))
      .toDF("id", "w", "h", "seed")
    val out = Multimodal.withImageStats(Multimodal.withEncodedPng(dims, "w", "h", "seed"), "png")
      .select("id", "img_width", "img_height", "mean_r", "mean_g", "mean_b")
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    for ((id, w, h, seed) <- Seq((1L, 8, 9, 42), (2L, 12, 8, 7), (3L, 16, 14, 500))) {
      val st = Multimodal.ImageCodec.decodeStats(Multimodal.ImageCodec.encodePng(w, h, seed))
      val r = out(id)
      assert(r.getInt(1) == st.width && r.getInt(2) == st.height)
      assert(r.getDouble(3) == st.meanR && r.getDouble(4) == st.meanG && r.getDouble(5) == st.meanB)
    }
  }

  test("frame sampling offsets are deterministic and bounded") {
    assert(VideoCodec.sampleFrameOffsets(10000, 4) == Seq(0L, 2500L, 5000L, 7500L))
    assert(VideoCodec.sampleFrameOffsets(0, 4).isEmpty)
    assert(VideoCodec.sampleFrameOffsets(10000, 0).isEmpty)
  }

  test("AudioCodec: WAV encode→javax.sound decode roundtrip matches the closed-form samples") {
    val bytes = Multimodal.AudioCodec.encodeWav(nSamples = 500, sampleRate = 8000, seed = 7)
    // genuine RIFF/WAVE container, not a hash-fake
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val s = Multimodal.AudioCodec.decodeStats(bytes)
    assert(s.sampleRate == 8000 && s.channels == 1 && s.frames == 500L)
    assert(s.durationMs == 62L) // 500·1000/8000 floor
    val samples = (0 until 500).map(i => Multimodal.AudioCodec.sample(i, 7))
    assert(s.peak == samples.map(math.abs).max)
    assert(math.abs(s.meanAbs - samples.map(math.abs).sum.toDouble / 500) < 1e-12)
  }

  test("AudioCodec: the -32768 boundary sample survives the container roundtrip") {
    // seed/index chosen so sample() hits the most negative 16-bit value
    val idx = (0 until 65536).find(i => Multimodal.AudioCodec.sample(i, 0) == -32768).get
    val bytes = Multimodal.AudioCodec.encodeWav(idx + 1, 8000, 0)
    val s = Multimodal.AudioCodec.decodeStats(bytes)
    assert(s.peak == 32768)
  }

  test("withEncodedWav + withAudioStats: distributed real decode matches driver-side decode") {
    import spark.implicits._
    val dims = Seq((1L, 400, 8000, 3), (2L, 700, 16000, 11))
      .toDF("id", "n", "rate", "seed")
    val out = Multimodal
      .withAudioStats(Multimodal.withEncodedWav(dims, "n", "rate", "seed"), "wav")
      .orderBy("id")
      .collect()
    out.foreach { r =>
      val driver = Multimodal.AudioCodec.decodeStats(
        Multimodal.AudioCodec.encodeWav(r.getInt(1), r.getInt(2), r.getInt(3)))
      assert(r.getAs[Int]("sample_rate") == driver.sampleRate)
      assert(r.getAs[Long]("frames") == driver.frames)
      assert(r.getAs[Long]("duration_ms") == driver.durationMs)
      assert(r.getAs[Double]("mean_abs") == driver.meanAbs)
      assert(r.getAs[Int]("peak") == driver.peak)
    }
    assert(out.map(_.getAs[Long]("duration_ms")).toSeq == Seq(50L, 43L)) // 400/8k, 700/16k
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

  test("resizeNearestHalf: closed-form parity and exact halving") {
    val png = Multimodal.ImageCodec.encodePng(10, 9, seed = 7)
    val small = Multimodal.ImageCodec.resizeNearestHalf(png)
    val s2 = Multimodal.ImageCodec.decodeStats(small)
    assert(s2.width == 5 && s2.height == 4)
    // closed form: resized pixel (x,y) = formula(2x, 2y, seed)
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until 4; x <- 0 until 5) {
      sr += Multimodal.ImageCodec.pixelR(2 * x, 2 * y, 7)
      sg += Multimodal.ImageCodec.pixelG(2 * x, 2 * y, 7)
      sb += Multimodal.ImageCodec.pixelB(2 * x, 2 * y, 7)
    }
    assert(s2.meanR == sr / 20.0 && s2.meanG == sg / 20.0 && s2.meanB == sb / 20.0)
  }
}
