package graft.model

/** Typed row models (FIXTURES.md §1-2) for the Dataset[T] surface —
  * compile-time field checks on the core pipeline; DataFrame remains
  * the dynamic-schema edge.
  */
final case class Doc(
    source: String,
    filename: String,
    folder_name: String,
    file_type: String,
    file_size: Long,
    title: Option[String],
    text: String,
    language: String,
    char_count: Int
)

final case class Chunk(
    chunk_id: String,
    text: String,
    embedding: Array[Float],
    source: String,
    filename: String,
    language: String,
    chunk_index: Int,
    total_chunks: Int,
    chunk_size_chars: Int,
    chunk_size_tokens: Int,
    collection: String,
    /** Dynamic-field overflow (reference enable_dynamic_field=True,
      * milvus_store.py:65; SURVEY §1.2): ad-hoc metadata keys that are
      * not part of the fixed schema ride here, so callers never need a
      * schema migration for one-off attributes.
      */
    extra: Map[String, String] = Map.empty
)

object Chunk {
  /** The fixed (declared) schema; anything else spills into `extra` —
    * see VectorStore.packDynamicFields.
    */
  val FixedFields: Seq[String] = Seq(
    "chunk_id", "text", "embedding", "source", "filename", "language",
    "chunk_index", "total_chunks", "chunk_size_chars", "chunk_size_tokens",
    "collection"
  )
}
