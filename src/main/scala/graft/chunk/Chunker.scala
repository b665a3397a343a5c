package graft.chunk

import graft.model.ChunkerConfig
import graft.lang.LanguageDetect
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hybrid chunking pipeline (reference chunker.py:127-175) as a Spark
  * Generator: one document row in → N chunk rows out via
  * `posexplode`, with ALL per-chunk metadata (K4) derived from the
  * exploded position and array size — deliberately NO window functions,
  * so the whole operator is shuffle-free and scales linearly.
  *
  * Reference stage order per document:
  *   1. semantic split (or pass-through when mode = character_only —
  *      the reference's own fallback, chunker.py:59-62, 137-141)
  *   2. size optimize: chunks > maxChunkSize → recursive char split (K2)
  *   3. small-chunk merge (K3)
  *   4. metadata enrich (K4): chunk_index, total_chunks, sizes,
  *      chunk_id = md5(source + "_" + index + "_" + text[:50])[:12]
  */
object Chunker {

  /** Pure per-document chunk function: (optional semantic stage K1) →
    * split oversize (K2) → merge small (K3). Semantic stage runs when
    * cfg.chunkingMode == "semantic_first" AND a splitter is supplied,
    * mirroring the reference's availability fallback
    * (chunker.py:59-62, 137-141).
    */
  def chunkText(
      text: String,
      cfg: ChunkerConfig,
      semantic: Option[SemanticSplitter] = None
  ): Seq[String] = {
    if (text == null || text.isEmpty) return Seq.empty
    val splitter = new RecursiveSplitter(cfg)
    val semanticChunks = semantic match {
      case Some(s) if cfg.chunkingMode == "semantic_first" =>
        try s.split(text)
        catch { case _: Throwable => Seq(text) } // reference fallback on error
      case _ => Seq(text)
    }
    val optimized = semanticChunks.flatMap { c =>
      if (c.length > cfg.maxChunkSize) splitter.split(c) else Seq(c)
    }
    ChunkMerger.merge(optimized, cfg.minChunkSize, cfg.maxChunkSize)
  }

  /** Column: text → array<string> of final chunks.
    * Marked non-deterministic ON PURPOSE (the function is pure): it
    * stops the optimizer from duplicating the expensive udf+cleaning
    * chain into inferred generator filters (InferFiltersFromGenerate
    * re-evaluated the whole chain 3× per row — measured 7s vs 0.4s at
    * sf0.1).
    */
  def chunksArray(cfg: ChunkerConfig, semantic: Option[SemanticSplitter] = None): Column => Column = {
    val f = udf { (s: String) => chunkText(s, cfg, semantic) }.asNondeterministic()
    c => f(c)
  }

  /** Explode a document DataFrame into chunk rows with the reference's
    * chunk metadata. `textCol` is chunked; `sourceCol` seeds chunk_id.
    * Output columns: all input columns (minus text) + text, chunk_index,
    * total_chunks, chunk_size_chars, chunk_size_tokens, chunk_id.
    */
  def explodeChunks(
      df: DataFrame,
      textCol: String,
      sourceCol: String,
      cfg: ChunkerConfig = ChunkerConfig.default,
      semantic: Option[SemanticSplitter] = None
  ): DataFrame = {
    val withArr = df.withColumn("__chunks", chunksArray(cfg, semantic)(col(textCol)))
    val exploded = withArr
      .withColumn("total_chunks", size(col("__chunks")))
      .select(
        (withArr.columns.filterNot(c => c == textCol || c == "__chunks").map(col) :+
          col("total_chunks") :+
          posexplode(col("__chunks")).as(Seq("chunk_index", textCol))): _*
      )
    exploded
      .withColumn("chunk_size_chars", length(col(textCol)))
      .withColumn("chunk_size_tokens", LanguageDetect.estimateTokens(col(textCol)))
      .withColumn("chunk_id", chunkId(col(sourceCol), col("chunk_index"), col(textCol)))
  }

  /** C17 — chunk_id (chunker.py:168-171): md5 over UTF-8 of
    * "{source}_{index}_{first 50 chars}", first 12 hex chars.
    */
  def chunkId(source: Column, index: Column, text: Column): Column =
    substring(
      md5(concat_ws("_", coalesce(source, lit("unknown")), index.cast("string"), substring(text, 1, 50))),
      1,
      12
    )
}
