package graft.chunk

import graft.model.ChunkerConfig
import scala.collection.mutable.ArrayBuffer

/** Pure-Scala reimplementation of the recursive character splitting
  * algorithm the reference delegates to LangChain's
  * `RecursiveCharacterTextSplitter` (chunker.py:37-43; algorithm is
  * public knowledge). Semantics: pick the coarsest separator present,
  * split keeping the separator attached to the FOLLOWING piece
  * (keep_separator=True default), greedily merge pieces into chunks of
  * ≤ chunkSize with chunkOverlap carry-over, recurse into oversize
  * pieces with the remaining (finer) separators.
  *
  * This is a pure `String => Seq[String]` function — executed inside a
  * Spark UDF at document granularity, so parallelism = input partitions
  * and the operator needs no shuffle.
  */
final class RecursiveSplitter(
    chunkSize: Int,
    chunkOverlap: Int,
    separators: List[String]
) extends Serializable {

  def this(cfg: ChunkerConfig) = this(cfg.targetChunkSize, cfg.chunkOverlap, cfg.separators)

  def split(text: String): Seq[String] =
    if (text == null || text.isEmpty) Seq.empty
    else splitRec(text, separators)

  private def splitRec(text: String, seps: List[String]): Seq[String] = {
    // choose the first separator that occurs in the text ("" always matches)
    var separator = seps.lastOption.getOrElse("")
    var remaining: List[String] = Nil
    var i = 0
    var found = false
    var rest = seps
    while (!found && rest.nonEmpty) {
      val s = rest.head
      if (s.isEmpty) { separator = s; remaining = Nil; found = true }
      else if (text.contains(s)) { separator = s; remaining = rest.tail; found = true }
      rest = rest.tail
      i += 1
    }

    val pieces = splitKeepSeparator(text, separator)
    val out = ArrayBuffer.empty[String]
    val good = ArrayBuffer.empty[String]
    pieces.foreach { p =>
      if (p.length < chunkSize) good += p
      else {
        if (good.nonEmpty) { out ++= mergePieces(good.toSeq); good.clear() }
        if (remaining.isEmpty) out += p
        else out ++= splitRec(p, remaining)
      }
    }
    if (good.nonEmpty) out ++= mergePieces(good.toSeq)
    out.toSeq
  }

  /** Split on `sep`, keeping the separator prepended to the following
    * piece; empty pieces dropped. sep == "" → individual characters.
    */
  private[chunk] def splitKeepSeparator(text: String, sep: String): Seq[String] = {
    if (sep.isEmpty) return text.map(_.toString)
    val out = ArrayBuffer.empty[String]
    var start = 0
    var idx = text.indexOf(sep)
    var first = true
    while (idx >= 0) {
      val piece = if (first) text.substring(start, idx) else text.substring(start - sep.length, idx)
      if (piece.nonEmpty) out += piece
      if (first) first = false
      start = idx + sep.length
      idx = text.indexOf(sep, start)
    }
    val last = if (first) text else text.substring(start - sep.length)
    if (last.nonEmpty) out += last
    out.toSeq
  }

  /** Greedy merge with overlap carry-over. Pieces already carry their
    * separators (keep_separator), so the join separator is "".
    */
  private[chunk] def mergePieces(pieces: Seq[String]): Seq[String] = {
    val docs = ArrayBuffer.empty[String]
    val current = ArrayBuffer.empty[String]
    var total = 0
    pieces.foreach { d =>
      val len = d.length
      if (total + len > chunkSize && current.nonEmpty) {
        val joined = current.mkString.trim
        if (joined.nonEmpty) docs += joined
        // pop from the front until within overlap and the next piece fits
        while (total > chunkOverlap || (total + len > chunkSize && total > 0)) {
          total -= current.head.length
          current.remove(0)
        }
      }
      current += d
      total += len
    }
    val joined = current.mkString.trim
    if (joined.nonEmpty) docs += joined
    docs.toSeq
  }
}

/** K3 — sequential small-chunk merge (chunker.py:75-125): a buffer scan
  * joining adjacent chunks with "\n" while the buffer or the incoming
  * chunk is below minChunkSize and the merge stays ≤ maxChunkSize.
  * Order-dependent per document — runs inside the same per-document UDF
  * as the splitter, which preserves order without any shuffle.
  */
object ChunkMerger {
  def merge(chunks: Seq[String], minSize: Int, maxSize: Int): Seq[String] = {
    if (chunks.isEmpty) return chunks
    val merged = ArrayBuffer.empty[String]
    var buffer: String = null
    chunks.foreach { chunk =>
      if (buffer == null) buffer = chunk
      else if (buffer.length < minSize || chunk.length < minSize) {
        val m = buffer + "\n" + chunk
        if (m.length <= maxSize) buffer = m
        else { merged += buffer; buffer = chunk }
      } else {
        merged += buffer
        buffer = chunk
      }
    }
    if (buffer != null) merged += buffer
    merged.toSeq
  }
}
