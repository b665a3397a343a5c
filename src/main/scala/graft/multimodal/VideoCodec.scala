package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

/** REAL video codec on pure JDK: MJPEG-in-AVI. AVI is a RIFF container
  * exactly like the WAV path ([[Multimodal.AudioCodec]]) — `RIFF('AVI ')`
  * holding a `hdrl` header list (`avih` main header + one `strl` video
  * stream with `strh`/`strf`), a `movi` list of `00dc` compressed-frame
  * chunks, and an `idx1` index. Each frame chunk is a genuine JPEG that
  * `javax.imageio` encodes and decodes (the JDK ships a JPEG codec, zero
  * egress). Reference behavior this stands in for: the video half of a
  * multimodal ingest path (decode, frame stats, frame sampling).
  *
  * Oracle-parity design: JPEG is lossy in general, but an image that is
  * CONSTANT WITHIN EACH ALIGNED 8x8 BLOCK survives the round trip
  * bit-exactly — each DCT block is flat, so only the DC coefficient is
  * non-zero and grayscale (single-component, no chroma subsampling, no
  * color-space rounding) reconstructs it exactly. Verified exhaustively
  * for all 256 levels and for multi-block patterns in VideoCodecSpec.
  * Frames generated from [[blockValue]] therefore decode to arithmetic
  * closed forms a SQL oracle can recompute — a green q_video_features
  * row proves real JPEG frames came out of a real AVI container with
  * the right pixels in the right frames.
  */
object VideoCodec {

  // Same JVM-wide switch as ImageCodec (see the note there): without
  // it every per-frame ImageIO encode/decode creates and deletes a
  // DISK temp-file stream cache — at ~10 frames per clip that is an
  // order of magnitude more temp files than the image path. Idempotent
  // with ImageCodec's init; set here too because either object can be
  // the first one loaded on an executor.
  javax.imageio.ImageIO.setUseCache(false)

  /** Gray level of the aligned 8x8 block (bx, by) of frame f — mirrored
    * verbatim in the q_video_features oracle SQL. Non-negative int
    * arithmetic so `%` agrees across engines; range [0, 255].
    */
  def blockValue(bx: Int, by: Int, f: Int, seed: Int): Int =
    (bx * 53 + by * 101 + f * 29 + seed * 13) % 256

  /** One genuine JPEG frame: `wBlocks x hBlocks` aligned 8x8 blocks,
    * each flat at [[blockValue]]. TYPE_BYTE_GRAY keeps the codec in
    * single-component mode (no chroma subsampling → exact round trip).
    */
  def encodeJpegFrame(wBlocks: Int, hBlocks: Int, f: Int, seed: Int): Array[Byte] = {
    require(wBlocks > 0 && hBlocks > 0, "frame must have at least one block")
    val (w, h) = (wBlocks * 8, hBlocks * 8)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, blockValue(x / 8, y / 8, f, seed))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, "jpg", out)
    require(ok, "no JPEG writer available")
    out.toByteArray
  }

  // ---- RIFF/AVI writer ------------------------------------------------

  private def u16(b: ByteArrayOutputStream, v: Int): Unit = {
    b.write(v & 0xff); b.write((v >> 8) & 0xff)
  }
  private def u32(b: ByteArrayOutputStream, v: Long): Unit = {
    b.write((v & 0xff).toInt); b.write(((v >> 8) & 0xff).toInt)
    b.write(((v >> 16) & 0xff).toInt); b.write(((v >> 24) & 0xff).toInt)
  }
  private def fcc(b: ByteArrayOutputStream, s: String): Unit = {
    require(s.length == 4, s"fourcc must be 4 chars: $s")
    b.write(s.getBytes(US_ASCII))
  }

  /** Encode an MJPEG AVI: `nFrames` frames of `wBlocks*8 x hBlocks*8`
    * gray pixels at `fps` frames/second. `fps` must divide 1,000,000 so
    * the `avih` microseconds-per-frame field is exact.
    */
  def encodeAviMjpeg(wBlocks: Int, hBlocks: Int, nFrames: Int, fps: Int, seed: Int): Array[Byte] = {
    require(nFrames > 0, "clip must have at least one frame")
    require(fps > 0 && 1000000 % fps == 0, s"fps must divide 1e6 exactly: $fps")
    val (w, h) = (wBlocks * 8, hBlocks * 8)
    val frames = (0 until nFrames).map(f => encodeJpegFrame(wBlocks, hBlocks, f, seed))
    val maxFrame = frames.map(_.length).max

    // movi list data: 'movi' fourcc then word-aligned '00dc' chunks
    val movi = new ByteArrayOutputStream()
    fcc(movi, "movi")
    // idx1 offsets count from the 'movi' fourcc (the common convention)
    val offsets = new Array[Int](nFrames)
    frames.zipWithIndex.foreach { case (jpg, i) =>
      offsets(i) = movi.size - 4
      fcc(movi, "00dc"); u32(movi, jpg.length.toLong)
      movi.write(jpg)
      if ((jpg.length & 1) == 1) movi.write(0) // RIFF chunks are word-aligned
    }

    val strh = new ByteArrayOutputStream()
    fcc(strh, "vids"); fcc(strh, "MJPG")
    u32(strh, 0); u16(strh, 0); u16(strh, 0) // dwFlags, wPriority, wLanguage
    u32(strh, 0)                             // dwInitialFrames
    u32(strh, 1); u32(strh, fps.toLong)      // dwScale=1, dwRate=fps → fps exact
    u32(strh, 0); u32(strh, nFrames.toLong)  // dwStart, dwLength (frames)
    u32(strh, maxFrame.toLong)               // dwSuggestedBufferSize
    u32(strh, 0xffffffffL); u32(strh, 0)     // dwQuality=-1 (default), dwSampleSize
    u16(strh, 0); u16(strh, 0); u16(strh, w); u16(strh, h) // rcFrame

    val strf = new ByteArrayOutputStream() // BITMAPINFOHEADER
    u32(strf, 40); u32(strf, w.toLong); u32(strf, h.toLong)
    u16(strf, 1); u16(strf, 24)              // biPlanes, biBitCount
    fcc(strf, "MJPG")                        // biCompression
    u32(strf, w.toLong * h * 3)              // biSizeImage (decoded)
    u32(strf, 0); u32(strf, 0); u32(strf, 0); u32(strf, 0)

    val avih = new ByteArrayOutputStream()
    u32(avih, 1000000L / fps)                // dwMicroSecPerFrame
    u32(avih, 0); u32(avih, 0)               // dwMaxBytesPerSec, dwPaddingGranularity
    u32(avih, 0x10)                          // dwFlags: AVIF_HASINDEX
    u32(avih, nFrames.toLong); u32(avih, 0)  // dwTotalFrames, dwInitialFrames
    u32(avih, 1)                             // dwStreams
    u32(avih, maxFrame.toLong)               // dwSuggestedBufferSize
    u32(avih, w.toLong); u32(avih, h.toLong)
    u32(avih, 0); u32(avih, 0); u32(avih, 0); u32(avih, 0) // dwReserved

    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      fcc(b, id); u32(b, data.length.toLong); b.write(data)
      if ((data.length & 1) == 1) b.write(0)
      b.toByteArray
    }
    def list(listType: String, data: Array[Byte]): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      fcc(b, "LIST"); u32(b, (data.length + 4).toLong); fcc(b, listType); b.write(data)
      b.toByteArray
    }

    val strl = list("strl", chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
    val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)

    val idx1 = new ByteArrayOutputStream()
    frames.zipWithIndex.foreach { case (jpg, i) =>
      fcc(idx1, "00dc"); u32(idx1, 0x10) // AVIIF_KEYFRAME
      u32(idx1, offsets(i).toLong); u32(idx1, jpg.length.toLong)
    }

    val moviBytes = movi.toByteArray
    val body = new ByteArrayOutputStream()
    body.write(hdrl)
    fcc(body, "LIST"); u32(body, moviBytes.length.toLong); body.write(moviBytes)
    body.write(chunk("idx1", idx1.toByteArray))

    val riff = new ByteArrayOutputStream()
    fcc(riff, "RIFF"); u32(riff, (body.size + 4).toLong); fcc(riff, "AVI ")
    riff.write(body.toByteArray)
    riff.toByteArray
  }

  // ---- RIFF/AVI reader ------------------------------------------------

  /** Decoded clip statistics. `meanLevel` is one IEEE division of an
    * exact integer pixel sum (the catalog's bit-parity rule); `peakLevel`
    * is the max decoded gray level across all frames.
    */
  final case class VideoStats(
      width: Int, height: Int, nFrames: Int, fps: Int,
      durationMs: Long, meanLevel: Double, peakLevel: Int,
      pixelSum: Long)

  private def fourccAt(bb: ByteBuffer, pos: Int): String = {
    val a = new Array[Byte](4)
    var i = 0
    while (i < 4) { a(i) = bb.get(pos + i); i += 1 }
    new String(a, US_ASCII)
  }

  /** Parse a real AVI container and decode every MJPEG frame. Strict on
    * structure (malformed input throws — callers that need the
    * reference's per-file error isolation wrap this in a null-on-failure
    * guard, the S8 pattern), and strict on consistency: decoded JPEG
    * dimensions must match the `avih` header, and the decoded frame
    * count must match both `avih.dwTotalFrames` and `strh.dwLength`.
    */
  def decodeAviMjpeg(bytes: Array[Byte]): VideoStats = {
    require(bytes.length >= 12, "truncated RIFF header")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(fourccAt(bb, 0) == "RIFF", "not a RIFF container")
    val riffLen = bb.getInt(4).toLong & 0xffffffffL
    require(riffLen + 8 <= bytes.length, "RIFF size exceeds payload")
    require(fourccAt(bb, 8) == "AVI ", "not an AVI RIFF form")

    var width = -1; var height = -1; var totalFrames = -1; var fps = -1; var strhFrames = -1
    var decodedFrames = 0
    var pixelSum = 0L
    var peak = 0

    def walkChunks(start: Int, end: Int, inMovi: Boolean): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val id = fourccAt(bb, pos)
        val size = bb.getInt(pos + 4).toLong & 0xffffffffL
        val dataStart = pos + 8
        require(dataStart + size <= end, s"chunk $id overruns its parent")
        if (id == "LIST") {
          require(size >= 4, "LIST chunk too small")
          val listType = fourccAt(bb, dataStart)
          walkChunks(dataStart + 4, dataStart + size.toInt, inMovi = listType == "movi")
        } else if (id == "avih") {
          require(size >= 40, "avih header too small")
          val usPerFrame = bb.getInt(dataStart).toLong & 0xffffffffL
          require(usPerFrame > 0 && 1000000 % usPerFrame == 0, s"non-integral fps: $usPerFrame us/frame")
          fps = (1000000L / usPerFrame).toInt
          totalFrames = bb.getInt(dataStart + 16)
          width = bb.getInt(dataStart + 32)
          height = bb.getInt(dataStart + 36)
        } else if (id == "strh") {
          require(size >= 40, "strh header too small")
          require(fourccAt(bb, dataStart) == "vids", "first stream is not video")
          require(fourccAt(bb, dataStart + 4) == "MJPG", "stream codec is not MJPG")
          val scale = bb.getInt(dataStart + 20)
          val rate = bb.getInt(dataStart + 24)
          require(scale == 1, s"unsupported strh.dwScale: $scale")
          require(fps == -1 || rate == fps, s"strh rate $rate disagrees with avih fps $fps")
          strhFrames = bb.getInt(dataStart + 32)
        } else if (inMovi && (id == "00dc" || id == "00db")) {
          val frame = new Array[Byte](size.toInt)
          var i = 0
          while (i < size.toInt) { frame(i) = bb.get(dataStart + i); i += 1 }
          val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(frame))
          require(img != null, "undecodable MJPEG frame")
          require(img.getWidth == width && img.getHeight == height,
            s"frame ${decodedFrames} is ${img.getWidth}x${img.getHeight}, header says ${width}x${height}")
          val raster = img.getRaster
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val v = raster.getSample(x, y, 0)
              pixelSum += v
              if (v > peak) peak = v
              x += 1
            }
            y += 1
          }
          decodedFrames += 1
        }
        pos = dataStart + size.toInt + (size.toInt & 1) // word alignment
      }
    }

    walkChunks(12, (riffLen + 8).toInt, inMovi = false)
    require(width > 0 && height > 0 && fps > 0, "missing or empty avih header")
    require(decodedFrames > 0, "no frames in movi list")
    require(decodedFrames == totalFrames,
      s"decoded $decodedFrames frames, avih declares $totalFrames")
    require(strhFrames == -1 || strhFrames == decodedFrames,
      s"decoded $decodedFrames frames, strh declares $strhFrames")

    VideoStats(
      width = width,
      height = height,
      nFrames = decodedFrames,
      fps = fps,
      durationMs = decodedFrames.toLong * 1000L / fps,
      meanLevel = pixelSum.toDouble / (decodedFrames.toLong * width * height),
      peakLevel = peak,
      pixelSum = pixelSum
    )
  }

  /** Frame-sampling offsets: `n` evenly spaced millisecond timestamps
    * over a clip of `durationMs` — the frame-sample shape a training
    * pipeline uses to thumbnail long videos.
    */
  def sampleFrameOffsets(durationMs: Long, n: Int): Seq[Long] =
    if (durationMs <= 0 || n <= 0) Seq.empty
    else (0 until n).map(i => durationMs * i / n)
}
