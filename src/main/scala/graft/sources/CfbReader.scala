package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.{ArrayBuffer, ListBuffer}

/** Minimal Compound File Binary (OLE2/CFB, MS-CFB spec — public) reader:
  * enough of the format to enumerate storages/streams and extract
  * stream bytes, which is all the HWP v5 container needs
  * (reference hwp_loader.py:126-177 does the same via `olefile`).
  * Supports v3 (512 B) and v4 (4096 B) sectors, FAT + DIFAT chains,
  * and the mini stream (streams under the 4096 B cutoff).
  *
  * Pure bytes→Map function — safe inside executor UDFs; malformed
  * containers raise (callers wrap with per-file error isolation, O9).
  */
object CfbReader {

  private val Signature = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte)
  private val EndOfChain = 0xfffffffe
  private val FreeSect = 0xffffffff

  final case class Entry(path: String, objType: Int, startSector: Int, size: Long)

  /** All stream entries by full path ("BodyText/Section0" → bytes). */
  def streams(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    require(bytes.length >= 512 && bytes.take(8).sameElements(Signature), "not a CFB container")
    val header = ByteBuffer.wrap(bytes, 0, 512).order(ByteOrder.LITTLE_ENDIAN)
    val sectorShift = header.getShort(30).toInt
    val sectorSize = 1 << sectorShift
    val miniShift = header.getShort(32).toInt
    val miniSize = 1 << miniShift // 64
    val numFatSectors = header.getInt(44)
    val firstDirSector = header.getInt(48)
    val miniCutoff = header.getInt(56)
    val firstMiniFatSector = header.getInt(60)
    val numMiniFatSectors = header.getInt(64)
    val firstDifatSector = header.getInt(68)
    val numDifatSectors = header.getInt(72)

    def sectorBytes(sector: Int): Array[Byte] = {
      // MS-CFB §2.1: sector n starts at (n+1)·sectorSize — the header
      // occupies "sector -1". Identical to 512+n·512 for v3, but v4
      // (4096 B sectors) pads the 512 B header to a full sector.
      val off = (sector.toLong + 1) * sectorSize
      require(off + sectorSize <= bytes.length + sectorSize, s"sector $sector out of range")
      val end = math.min(off + sectorSize, bytes.length.toLong).toInt
      java.util.Arrays.copyOfRange(bytes, off.toInt, end)
    }

    // DIFAT: 109 header entries + chained DIFAT sectors
    val difat = ArrayBuffer.empty[Int]
    (0 until 109).foreach(i => difat += header.getInt(76 + i * 4))
    var difatSector = firstDifatSector
    var difatCount = 0
    while (difatSector != EndOfChain && difatSector != FreeSect && difatCount < numDifatSectors) {
      val sb = ByteBuffer.wrap(sectorBytes(difatSector)).order(ByteOrder.LITTLE_ENDIAN)
      val perSector = sectorSize / 4 - 1
      (0 until perSector).foreach(i => difat += sb.getInt(i * 4))
      difatSector = sb.getInt(perSector * 4)
      difatCount += 1
    }

    // FAT
    val fat = ArrayBuffer.empty[Int]
    difat.take(numFatSectors).filter(s => s != FreeSect && s >= 0).foreach { s =>
      val sb = ByteBuffer.wrap(sectorBytes(s)).order(ByteOrder.LITTLE_ENDIAN)
      (0 until sectorSize / 4).foreach(i => fat += sb.getInt(i * 4))
    }

    def chain(start: Int, limit: Int = 1 << 20): Seq[Int] = {
      val out = ListBuffer.empty[Int]
      var s = start
      var n = 0
      while (s != EndOfChain && s != FreeSect && s >= 0 && n < limit) {
        out += s
        s = if (s < fat.length) fat(s) else EndOfChain
        n += 1
      }
      out.toSeq
    }

    def readChain(start: Int, size: Long): Array[Byte] = {
      val data = chain(start).iterator.flatMap(sectorBytes).toArray
      data.take(math.min(size, data.length.toLong).toInt)
    }

    // MiniFAT
    val miniFat = ArrayBuffer.empty[Int]
    chain(firstMiniFatSector).take(numMiniFatSectors).foreach { s =>
      val sb = ByteBuffer.wrap(sectorBytes(s)).order(ByteOrder.LITTLE_ENDIAN)
      (0 until sectorSize / 4).foreach(i => miniFat += sb.getInt(i * 4))
    }

    // Directory
    val dirBytes = chain(firstDirSector).iterator.flatMap(sectorBytes).toArray
    val numEntries = dirBytes.length / 128
    case class RawEntry(name: String, objType: Int, left: Int, right: Int, child: Int, start: Int, size: Long)
    val entries = (0 until numEntries).map { i =>
      val eb = ByteBuffer.wrap(dirBytes, i * 128, 128).order(ByteOrder.LITTLE_ENDIAN)
      val nameLen = eb.getShort(i * 128 + 64) & 0xffff
      val name =
        if (nameLen >= 2) new String(dirBytes, i * 128, nameLen - 2, "UTF-16LE") else ""
      RawEntry(
        name,
        dirBytes(i * 128 + 66) & 0xff,
        eb.getInt(i * 128 + 68),
        eb.getInt(i * 128 + 72),
        eb.getInt(i * 128 + 76),
        eb.getInt(i * 128 + 116),
        eb.getLong(i * 128 + 120)
      )
    }
    if (entries.isEmpty) return Map.empty

    // mini stream = root entry's regular chain
    val root = entries.head
    val miniStream = readChain(root.start, root.size)

    def readMiniChain(start: Int, size: Long): Array[Byte] = {
      val out = ArrayBuffer.empty[Byte]
      var s = start
      var n = 0
      while (s != EndOfChain && s != FreeSect && s >= 0 && n < (1 << 20)) {
        val off = s * miniSize
        if (off < miniStream.length)
          out ++= miniStream.slice(off, math.min(off + miniSize, miniStream.length))
        s = if (s < miniFat.length) miniFat(s) else EndOfChain
        n += 1
      }
      out.take(math.min(size, out.length.toLong).toInt).toArray
    }

    // walk the red-black sibling trees to build full paths
    val result = scala.collection.mutable.Map.empty[String, Array[Byte]]
    val seen = scala.collection.mutable.Set.empty[Int]

    def walkSiblings(id: Int, prefix: String): Unit = {
      if (id < 0 || id >= entries.length || id == FreeSect || !seen.add(id)) return
      val e = entries(id)
      walkSiblings(e.left, prefix)
      walkSiblings(e.right, prefix)
      val path = if (prefix.isEmpty) e.name else s"$prefix/${e.name}"
      if (e.objType == 2) { // stream
        val data =
          if (e.size < miniCutoff) readMiniChain(e.start, e.size)
          else readChain(e.start, e.size)
        result(path) = data
      } else if (e.objType == 1) { // storage
        walkSiblings(e.child, path)
      }
    }

    walkSiblings(root.child, "")
    result.toMap
  }
}
