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

  private val VT_I2 = 2
  private val VT_LPSTR = 30
  private val VT_LPWSTR = 31

  // MS-OLEPS §2.18.2: pid 1 is the code page for all 8-bit strings in
  // the set. HWP commonly writes CP949.
  private val PidCodePage = 1

  private def charsetFor(codePage: Int): java.nio.charset.Charset = {
    val name = codePage match {
      case 949 => "x-windows-949"
      case 1200 => "UTF-16LE"
      case 65001 => "UTF-8"
      case cp => s"windows-$cp"
    }
    try java.nio.charset.Charset.forName(name)
    catch {
      case _: Exception =>
        try java.nio.charset.Charset.forName("x-windows-949")
        catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 }
    }
  }

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
      // First pass: the set's CodePage property (pid 1) governs how
      // VT_LPSTR bytes are decoded — default CP949 (HWP's usual choice)
      // when absent.
      val codePage = (0 until numProps).collectFirst {
        case i
            if b.getInt(setOffset + 8 + i * 8) == PidCodePage &&
              b.getInt(setOffset + b.getInt(setOffset + 12 + i * 8)) == VT_I2 =>
          b.getShort(setOffset + b.getInt(setOffset + 12 + i * 8) + 4) & 0xffff
      }
      val lpstrCharset = charsetFor(codePage.getOrElse(949))
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
            else Some(pid -> new String(stream, propOffset + 8, nBytes - 1, lpstrCharset))
          case _ => None
        }
      }.toMap
    } catch { case _: Throwable => Map.empty }
  }
}
