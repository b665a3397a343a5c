package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared text canonicalization for every dedup family: the
  * reference's normalization (chunker.py:193-194), the content hash,
  * and the single tokenize+shingle implementation whose universe the
  * signature builder, candidate verifier and index side all agree on.
  */
private[dedup] trait TextNormalization extends Serializable {

  /** Normalization used by the reference before hashing
    * (chunker.py:193-194): lowercase + whitespace-collapse (Python
    * `' '.join(s.lower().split())` — leading/trailing runs vanish).
    */
  def normalizedText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Exact-hash content key. */
  def contentHash(c: Column): Column = md5(normalizedText(c))

  /** Distinct word n-grams in ONE fused pass (UDF) — a
    * LinkedHashSet-dedup over [[shingleArray]], so the signature
    * builder, the candidate verifier, and this index-side helper share
    * ONE tokenize+shingle implementation (and therefore one canonical
    * empty-doc behavior: zero tokens → zero shingles). Fused because
    * the HOF transform/slice/concat_ws pipeline materializes an
    * intermediate array per shingle (~8 s of q_decontaminate at sf0.1;
    * same lesson as the MinHash signature builder). Marked
    * nondeterministic so the optimizer never duplicates it into
    * inferred filters under a later explode (InferFiltersFromGenerate).
    */
  def distinctShingles(textCol: Column, n: Int): Column = {
    val f = udf { (text: String) =>
      val seen = new java.util.LinkedHashSet[String]
      shingleArray(text, n).foreach(seen.add)
      import scala.jdk.CollectionConverters._
      seen.asScala.toSeq
    }
    f.asNondeterministic()(textCol)
  }

  /** Tokenize + shingle, as a plain Scala function shared by the
    * signature builder, the candidate verifier, and the index-side
    * [[distinctShingles]] so all see the exact same shingle universe.
    * Zero tokens → ZERO shingles (the DuckDB oracles encode the same
    * rule explicitly). Locale.ROOT lowercasing — default-locale
    * toLowerCase diverges from engine lower() under tr/az locales
    * (dotless ı) and Greek final sigma.
    */
  private[dedup] def shingleArray(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
    if (toks.length == 0) Array.empty
    else if (toks.length < n) Array(toks.mkString(" "))
    else Array.tabulate(toks.length - n + 1)(i => toks.slice(i, i + n).mkString(" "))
  }
}
