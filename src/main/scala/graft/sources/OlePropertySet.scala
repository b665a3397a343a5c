package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal OLE property set (MS-OLEPS, public spec) reader — enough to
  * pull the string properties HWP writes into
  * `\x05HwpSummaryInformation` (title/subject/author/keywords, the
  * metadata the reference surfaces via olefile:
  * hwp_loader.py:358-371). Returns property-id → string for VT_LPWSTR
  * / VT_LPSTR values; anything else is skipped.
  */
object OlePropertySet {

  private val VT_LPSTR = 30
  private val VT_LPWSTR = 31

  // canonical SummaryInformation property ids
  val PidTitle = 2
  val PidSubject = 3
  val PidAuthor = 4
  val PidKeywords = 5

  def stringProperties(stream: Array[Byte]): Map[Int, String] = {
    try {
      val b = ByteBuffer.wrap(stream).order(ByteOrder.LITTLE_ENDIAN)
      // PropertySetStream header: byteOrder, version, systemId, clsid, count
      val byteOrder = b.getShort(0) & 0xffff
      if (byteOrder != 0xfffe) return Map.empty
      val numSets = b.getInt(24)
      if (numSets < 1) return Map.empty
      // first FMTID/offset pair sits at 28; the set offset at 28+16
      val setOffset = b.getInt(28 + 16)
      val numProps = b.getInt(setOffset + 4)
      (0 until numProps).flatMap { i =>
        val pid = b.getInt(setOffset + 8 + i * 8)
        val propOffset = setOffset + b.getInt(setOffset + 12 + i * 8)
        val vt = b.getInt(propOffset)
        vt match {
          case VT_LPWSTR =>
            val nChars = b.getInt(propOffset + 4)
            if (nChars <= 0) None
            else {
              val s = new String(stream, propOffset + 8, (nChars - 1) * 2, "UTF-16LE")
              Some(pid -> s)
            }
          case VT_LPSTR =>
            val nBytes = b.getInt(propOffset + 4)
            if (nBytes <= 0) None
            else Some(pid -> new String(stream, propOffset + 8, nBytes - 1, "UTF-8"))
          case _ => None
        }
      }.toMap
    } catch { case _: Throwable => Map.empty }
  }
}
