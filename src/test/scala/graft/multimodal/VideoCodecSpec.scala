package graft.multimodal

import graft.SparkTestBase

/** Pins the property the q_video_features oracle rests on: grayscale
  * JPEG frames that are constant within each aligned 8x8 block survive
  * the javax.imageio round trip BIT-EXACTLY (flat DCT blocks — only the
  * DC coefficient is non-zero, single-component so no chroma rounding).
  * Plus the RIFF/AVI container contract: real chunk structure, strict
  * decode, closed-form stats.
  */
class VideoCodecSpec extends SparkTestBase {

  test("uniform grayscale JPEG round-trips bit-exactly for every level 0..255") {
    for (v <- 0 until 256) {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 8; x <- 0 until 8) img.getRaster.setSample(x, y, 0, v)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", out))
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.toByteArray))
      for (y <- 0 until 8; x <- 0 until 8)
        assert(back.getRaster.getSample(x, y, 0) == v, s"level $v at ($x,$y)")
    }
  }

  test("encodeJpegFrame decodes to the exact blockValue closed form") {
    for ((wb, hb, f, seed) <- Seq((1, 1, 0, 0), (3, 2, 5, 437), (4, 4, 7, 999))) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(VideoCodec.encodeJpegFrame(wb, hb, f, seed)))
      assert(img.getWidth == wb * 8 && img.getHeight == hb * 8)
      for (y <- 0 until hb * 8; x <- 0 until wb * 8)
        assert(img.getRaster.getSample(x, y, 0) == VideoCodec.blockValue(x / 8, y / 8, f, seed))
    }
  }

  test("AVI container: genuine RIFF structure with hdrl/movi/idx1 and MJPG frames") {
    val bytes = VideoCodec.encodeAviMjpeg(3, 2, 4, 10, 42)
    def fcc(i: Int) = new String(bytes.slice(i, i + 4), "US-ASCII")
    assert(fcc(0) == "RIFF" && fcc(8) == "AVI ")
    assert(fcc(12) == "LIST" && fcc(20) == "hdrl" && fcc(24) == "avih")
    // declared RIFF size covers the whole payload
    val riffLen = java.nio.ByteBuffer.wrap(bytes, 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(riffLen + 8 == bytes.length)
    val s = new String(bytes, "ISO-8859-1")
    assert(s.contains("movi") && s.contains("00dc") && s.contains("idx1") && s.contains("MJPG"))
  }

  test("encode→decode roundtrip: stats match the arithmetic closed form") {
    for ((wb, hb, nf, fps, seed) <- Seq((2, 2, 3, 25, 0), (3, 4, 8, 8, 437), (4, 2, 5, 20, 999))) {
      val st = VideoCodec.decodeAviMjpeg(VideoCodec.encodeAviMjpeg(wb, hb, nf, fps, seed))
      assert(st.width == wb * 8 && st.height == hb * 8)
      assert(st.nFrames == nf && st.fps == fps)
      assert(st.durationMs == nf.toLong * 1000 / fps)
      val blocks = for (f <- 0 until nf; by <- 0 until hb; bx <- 0 until wb)
        yield VideoCodec.blockValue(bx, by, f, seed)
      assert(st.peakLevel == blocks.max)
      // mean over pixels == mean over blocks (64 equal pixels each);
      // one IEEE division of an exact integer sum on both sides
      assert(st.meanLevel == blocks.map(_.toLong).sum.toDouble / blocks.size)
    }
  }

  test("decode is strict: corrupt containers throw, not garbage") {
    val good = VideoCodec.encodeAviMjpeg(2, 2, 3, 10, 7)
    intercept[IllegalArgumentException](VideoCodec.decodeAviMjpeg(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](VideoCodec.decodeAviMjpeg(good.take(40))) // truncated
    val notAvi = good.clone(); System.arraycopy("WAVE".getBytes, 0, notAvi, 8, 4)
    intercept[IllegalArgumentException](VideoCodec.decodeAviMjpeg(notAvi))
    // frame-count lie in avih (offset 12+8+4+8+16 = header-relative dwTotalFrames)
    val lied = good.clone()
    val avihData = 32 // RIFF(12) + LIST hdr(8) + 'hdrl'(4) + avih hdr(8)
    lied(avihData + 16) = (lied(avihData + 16) + 1).toByte
    intercept[IllegalArgumentException](VideoCodec.decodeAviMjpeg(lied))
  }

  test("withEncodedAvi + withVideoStats: distributed real decode matches driver-side decode") {
    import spark.implicits._
    val dims = Seq((1L, 2, 2, 3, 25, 42), (2L, 4, 3, 6, 8, 7))
      .toDF("id", "wb", "hb", "nf", "fps", "seed")
    val out = Multimodal
      .withVideoStats(Multimodal.withEncodedAvi(dims, "wb", "hb", "nf", "fps", "seed"), "avi")
      .orderBy("id").collect()
    out.foreach { r =>
      val driver = VideoCodec.decodeAviMjpeg(VideoCodec.encodeAviMjpeg(
        r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
      assert(r.getAs[Int]("vid_width") == driver.width)
      assert(r.getAs[Int]("vid_height") == driver.height)
      assert(r.getAs[Int]("n_frames") == driver.nFrames)
      assert(r.getAs[Int]("fps") == driver.fps)
      assert(r.getAs[Long]("duration_ms") == driver.durationMs)
      assert(r.getAs[Double]("mean_level") == driver.meanLevel)
      assert(r.getAs[Int]("peak_level") == driver.peakLevel)
    }
    assert(out.map(_.getAs[Long]("duration_ms")).toSeq == Seq(120L, 750L)) // 3/25, 6/8
  }
}
