package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

/** Spec-conformant HWP/HWPX container builders — the payload-generation
  * side of the graded extraction queries (the same
  * generate-real-payloads pattern q_audio_features uses for WAV): a
  * query synthesizes per-row container BYTES with these, decodes them
  * with the REAL readers ([[CfbReader]]/[[HwpLoader]]), and the DuckDB
  * oracle recomputes the decoded text closed-form. Green therefore
  * proves a genuine binary round-trip, not a string no-op.
  *
  * The CFB builder writes the real structures the reference consumes
  * via `olefile` (hwp_loader.py:126-239): header, FAT, DIFAT-in-header,
  * red-black directory tree, miniFAT + mini stream, HWP FileHeader
  * with the compression flag, raw-deflated UTF-16LE BodyText sections,
  * and an MS-OLEPS HwpSummaryInformation property set
  * (hwp_loader.py:358-371).
  */
object HwpPayloads {

  private val Free = 0xffffffff
  private val EndChain = 0xfffffffe
  private val FatSect = 0xfffffffd

  def deflateRaw(data: Array[Byte]): Array[Byte] = {
    // BEST_SPEED: payload generation, not archival — the decode side
    // (HwpLoader.inflateRaw) is level-agnostic. end() releases the
    // native zlib state eagerly; leaking it to the finalizer at 50k
    // containers per bench run pressures native memory.
    val d = new Deflater(Deflater.BEST_SPEED, true)
    try {
      d.setInput(data); d.finish()
      val out = new java.io.ByteArrayOutputStream(data.length.max(64))
      val buf = new Array[Byte](1 << 16)
      while (!d.finished()) {
        val n = d.deflate(buf)
        if (n > 0) out.write(buf, 0, n)
      }
      out.toByteArray
    } finally d.end()
  }

  /** MS-OLEPS PropertySetStream carrying title (pid 2) and author
    * (pid 4) as VT_LPWSTR — what [[OlePropertySet.stringProperties]]
    * parses.
    */
  def buildSummaryStream(title: String, author: String): Array[Byte] = {
    def lpwstr(s: String): Array[Byte] = {
      val chars = s + "\u0000"
      val b = ByteBuffer.allocate(8 + chars.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(31) // VT_LPWSTR
      b.putInt(chars.length)
      b.put(chars.getBytes("UTF-16LE"))
      b.array()
    }
    val vTitle = lpwstr(title)
    val vAuthor = lpwstr(author)
    val setOffset = 48 // header(28) + fmtid(16) + offset(4)
    val headerSize = 8 + 2 * 8 // size+count + 2 id/offset pairs
    val b = ByteBuffer.allocate(setOffset + headerSize + vTitle.length + vAuthor.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.putShort(0, 0xfffe.toShort) // byte order
    b.putInt(24, 1) // one property set
    b.putInt(44, setOffset) // offset of the set (fmtid left zero)
    b.position(setOffset)
    b.putInt(headerSize + vTitle.length + vAuthor.length) // set size
    b.putInt(2) // numProps
    b.putInt(2); b.putInt(headerSize) // pid 2 (title)
    b.putInt(4); b.putInt(headerSize + vTitle.length) // pid 4 (author)
    b.put(vTitle); b.put(vAuthor)
    b.array()
  }

  /** HWP-shaped CFB container: FileHeader (256 B, compression flag at
    * byte 36), HwpSummaryInformation (title/author), and
    * BodyText/Section{i} for each section text (raw-deflated UTF-16LE
    * when `compressed`). `sectionTexts` may be empty — the container
    * then has a BodyText storage with no sections, which
    * [[HwpLoader.extractHwp]] must treat as a failed doc (S8).
    *
    * Directory tree: Root.child → FileHeader; FileHeader.left →
    * summary, .right → BodyText storage; sections chain via .right.
    */
  def buildHwpCfb(
      sectionTexts: Seq[String],
      compressed: Boolean,
      title: String = "t",
      author: String = "a"
  ): Array[Byte] = {
    val fileHeader = new Array[Byte](256)
    val sig = "HWP Document File".getBytes("US-ASCII")
    System.arraycopy(sig, 0, fileHeader, 0, sig.length)
    fileHeader(36) = if (compressed) 1 else 0

    val summary = buildSummaryStream(title, author)
    val sections = sectionTexts.map { t =>
      val raw = t.getBytes("UTF-16LE")
      if (compressed) deflateRaw(raw) else raw
    }

    // Mini-stream layout: every stream starts on a 64 B mini-sector
    // boundary; chains are consecutive minis ending in EndChain.
    val streams: Seq[Array[Byte]] = fileHeader +: summary +: sections
    val miniCounts = streams.map(s => math.max(1, (s.length + 63) / 64))
    val miniStarts = miniCounts.scanLeft(0)(_ + _)
    val totalMinis = miniStarts.last
    require(totalMinis <= 128, s"payload too large for one miniFAT sector: $totalMinis minis")
    val miniStream = new Array[Byte](totalMinis * 64)
    streams.zip(miniStarts).foreach { case (s, st) =>
      System.arraycopy(s, 0, miniStream, st * 64, s.length)
    }
    val miniStreamSectors = (miniStream.length + 511) / 512

    // Directory: 0 Root, 1 FileHeader, 2 summary, 3 BodyText storage,
    // 4.. sections; padded to whole 512 B sectors (4 entries each).
    val numEntries = 4 + sections.length
    val dirSectors = (numEntries + 3) / 4

    // Sector map: 0 = FAT, 1..dirSectors = directory, next = miniFAT,
    // then the mini stream's regular-sector chain.
    val miniFatSector = 1 + dirSectors
    val miniStreamFirst = miniFatSector + 1
    val totalSectors = miniStreamFirst + miniStreamSectors
    require(totalSectors <= 128, s"container too large for one FAT sector: $totalSectors sectors")

    val body = ByteBuffer.allocate(totalSectors * 512).order(ByteOrder.LITTLE_ENDIAN)

    // FAT (sector 0)
    val fat = Array.fill(128)(Free)
    fat(0) = FatSect
    (1 to dirSectors).foreach(i => fat(i) = if (i == dirSectors) EndChain else i + 1)
    fat(miniFatSector) = EndChain
    (0 until miniStreamSectors).foreach { i =>
      fat(miniStreamFirst + i) =
        if (i == miniStreamSectors - 1) EndChain else miniStreamFirst + i + 1
    }
    fat.foreach(body.putInt)

    // Directory sectors
    def dirEntry(name: String, objType: Int, left: Int, right: Int, child: Int, start: Int, size: Long): Array[Byte] = {
      val e = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      val n = name.getBytes("UTF-16LE")
      e.put(n, 0, math.min(n.length, 62))
      e.putShort(64, (math.min(n.length, 62) + 2).toShort)
      e.put(66, objType.toByte)
      e.putInt(68, left); e.putInt(72, right); e.putInt(76, child)
      e.putInt(116, start); e.putLong(120, size)
      e.array()
    }
    body.position(1 * 512)
    body.put(dirEntry("Root Entry", 5, -1, -1, 1, miniStreamFirst, miniStream.length.toLong))
    body.put(dirEntry("FileHeader", 2, 2, 3, -1, miniStarts(0), 256L))
    body.put(dirEntry("\u0005HwpSummaryInformation", 2, -1, -1, -1, miniStarts(1), summary.length.toLong))
    body.put(
      dirEntry("BodyText", 1, -1, -1, if (sections.isEmpty) -1 else 4, 0, 0L))
    sections.zipWithIndex.foreach { case (s, i) =>
      body.put(dirEntry(
        s"Section$i", 2, -1,
        if (i == sections.length - 1) -1 else 5 + i,
        -1, miniStarts(2 + i), s.length.toLong))
    }

    // MiniFAT
    val miniFat = Array.fill(128)(Free)
    streams.indices.foreach { si =>
      val st = miniStarts(si)
      val n = miniCounts(si)
      (0 until n).foreach(i => miniFat(st + i) = if (i == n - 1) EndChain else st + i + 1)
    }
    body.position(miniFatSector * 512)
    miniFat.foreach(body.putInt)

    // Mini stream
    body.position(miniStreamFirst * 512)
    body.put(miniStream)

    // Header
    val header = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte))
    header.putShort(26, 3.toShort) // major version
    header.putShort(28, 0xfffe.toShort) // byte order
    header.putShort(30, 9.toShort) // sector shift → 512
    header.putShort(32, 6.toShort) // mini shift → 64
    header.putInt(40, 0) // num dir sectors (v3: 0)
    header.putInt(44, 1) // num FAT sectors
    header.putInt(48, 1) // first directory sector
    header.putInt(56, 4096) // mini cutoff
    header.putInt(60, miniFatSector) // first miniFAT sector
    header.putInt(64, 1) // num miniFAT sectors
    header.putInt(68, EndChain) // first DIFAT sector
    header.putInt(72, 0) // num DIFAT sectors
    header.putInt(76, 0) // DIFAT[0] = FAT sector 0
    (1 until 109).foreach(i => header.putInt(76 + i * 4, Free))

    header.array() ++ body.array()
  }

  /** Real HWPX zip container: the given section XMLs as
    * `Contents/section{i}.xml`, metadata as `Contents/meta.xml`, plus
    * decoy entries ([[HwpLoader.extractHwpx]] must skip a non-XML
    * "section" name and the mimetype).
    */
  def buildHwpxZip(sectionXmls: Seq[String], metaXml: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.setLevel(Deflater.BEST_SPEED) // generation-side; readers are level-agnostic
    def put(name: String, data: Array[Byte]): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(data)
      zos.closeEntry()
    }
    put("mimetype", "application/hwp+zip".getBytes("UTF-8"))
    put("Preview/section.txt", "decoy — not xml".getBytes("UTF-8"))
    sectionXmls.zipWithIndex.foreach { case (xml, i) =>
      put(s"Contents/section$i.xml", xml.getBytes("UTF-8"))
    }
    put("Contents/meta.xml", metaXml.getBytes("UTF-8"))
    zos.close()
    bos.toByteArray
  }
}
