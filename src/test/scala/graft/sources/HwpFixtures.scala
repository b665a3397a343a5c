package graft.sources

/** Test-side façade over the main-source container builders
  * ([[HwpPayloads]], promoted to main when the graded extraction
  * queries started generating per-row payloads): single-section HWP
  * CFB with the summary stream defaults.
  */
object HwpFixtures {

  def deflateRaw(data: Array[Byte]): Array[Byte] = HwpPayloads.deflateRaw(data)

  def buildHwpCfb(sectionText: String, compressed: Boolean): Array[Byte] =
    HwpPayloads.buildHwpCfb(Seq(sectionText), compressed)
}
