package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Deflater

/** Spec-conformant CFB/HWP fixture builder shared by CfbReaderSpec and
  * the CLI end-to-end spec: header, FAT, DIFAT-in-header, directory,
  * miniFAT + mini stream, HWP FileHeader + raw-deflated UTF-16LE
  * BodyText/Section0 — a real binary .hwp as far as any reader is
  * concerned (reference hwp_loader.py:126-239 consumes the same
  * structures via olefile).
  */
object HwpFixtures {

  private val Free = 0xffffffff
  private val EndChain = 0xfffffffe
  private val FatSect = 0xfffffffd

  def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val buf = new Array[Byte](1 << 16)
    val n = d.deflate(buf)
    buf.take(n)
  }

  /** Minimal HWP-shaped CFB: FileHeader (256 B, compressed flag) +
    * BodyText/Section0 (raw-deflated UTF-16LE), both in the mini
    * stream. Sectors: 0=FAT, 1=directory, 2=miniFAT, 3+=mini stream.
    */
  def buildHwpCfb(sectionText: String, compressed: Boolean): Array[Byte] = {
    val fileHeader = new Array[Byte](256)
    val sig = "HWP Document File".getBytes("US-ASCII")
    System.arraycopy(sig, 0, fileHeader, 0, sig.length)
    fileHeader(36) = if (compressed) 1 else 0
    val sectionRaw = sectionText.getBytes("UTF-16LE")
    val section = if (compressed) deflateRaw(sectionRaw) else sectionRaw

    // mini stream: FileHeader at mini sectors 0..3, section at 4..
    val miniSectors = 4 + (section.length + 63) / 64
    val miniStream = new Array[Byte](miniSectors * 64)
    System.arraycopy(fileHeader, 0, miniStream, 0, 256)
    System.arraycopy(section, 0, miniStream, 256, section.length)
    val miniStreamSectors = (miniStream.length + 511) / 512

    val totalSectors = 3 + miniStreamSectors
    val body = ByteBuffer.allocate(totalSectors * 512).order(ByteOrder.LITTLE_ENDIAN)

    // sector 0: FAT
    val fat = Array.fill(128)(Free)
    fat(0) = FatSect
    fat(1) = EndChain // directory
    fat(2) = EndChain // miniFAT
    (0 until miniStreamSectors).foreach { i =>
      fat(3 + i) = if (i == miniStreamSectors - 1) EndChain else 3 + i + 1
    }
    fat.foreach(body.putInt)

    // sector 1: directory (4 entries)
    def dirEntry(name: String, objType: Int, left: Int, right: Int, child: Int, start: Int, size: Long): Array[Byte] = {
      val e = ByteBuffer.allocate(128).order(ByteOrder.LITTLE_ENDIAN)
      val n = name.getBytes("UTF-16LE")
      e.put(n, 0, math.min(n.length, 62))
      e.putShort(64, ((math.min(n.length, 62)) + 2).toShort)
      e.put(66, objType.toByte)
      e.putInt(68, left); e.putInt(72, right); e.putInt(76, child)
      e.putInt(116, start); e.putLong(120, size)
      e.array()
    }
    body.put(dirEntry("Root Entry", 5, -1, -1, 1, 3, miniStream.length.toLong))
    body.put(dirEntry("FileHeader", 2, -1, 2, -1, 0, 256L))
    body.put(dirEntry("BodyText", 1, -1, -1, 3, 0, 0L))
    body.put(dirEntry("Section0", 2, -1, -1, -1, 4, section.length.toLong))

    // sector 2: miniFAT
    val miniFat = Array.fill(128)(Free)
    miniFat(0) = 1; miniFat(1) = 2; miniFat(2) = 3; miniFat(3) = EndChain
    val sectionMinis = (section.length + 63) / 64
    (0 until sectionMinis).foreach { i =>
      miniFat(4 + i) = if (i == sectionMinis - 1) EndChain else 4 + i + 1
    }
    body.position(2 * 512)
    miniFat.foreach(body.putInt)

    // sectors 3+: mini stream
    body.position(3 * 512)
    body.put(miniStream)

    // header
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
    header.putInt(60, 2) // first miniFAT sector
    header.putInt(64, 1) // num miniFAT sectors
    header.putInt(68, EndChain) // first DIFAT sector
    header.putInt(72, 0) // num DIFAT sectors
    header.putInt(76, 0) // DIFAT[0] = FAT sector 0
    (1 until 109).foreach(i => header.putInt(76 + i * 4, Free))

    header.array() ++ body.array()
  }
}
