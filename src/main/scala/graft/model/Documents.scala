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
    collection: String
)
