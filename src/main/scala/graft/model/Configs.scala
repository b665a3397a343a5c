package graft.model

/** Engine configuration, mirroring the reference's dataclass config surface
  * (reference: modules/config.py:69-108) so behavior is tunable the same way.
  * All defaults match the reference's published constants (BASELINE.md).
  */
final case class ChunkerConfig(
    targetChunkSize: Int = 300, // config.py:76
    chunkOverlap: Int = 60, // config.py:77
    minChunkSize: Int = 100, // config.py:78
    maxChunkSize: Int = 500, // config.py:79
    separators: List[String] = ChunkerConfig.DefaultSeparators, // config.py:80-92
    chunkingMode: String = "character_only", // config.py:69 ("semantic_first" | "character_only")
    breakpointPercentile: Double = 70.0 // config.py:72-73
)

object ChunkerConfig {
  /** Separator hierarchy, coarse to fine (reference config.py:80-92). */
  val DefaultSeparators: List[String] =
    List("\n\n\n", "\n\n", "\n", ". ", "? ", "! ", "; ", ", ", " ", "")
  val default: ChunkerConfig = ChunkerConfig()
}

final case class EmbeddingConfig(
    dim: Int = 1024, // config.py:60 (BGE-M3 dimension)
    batchSize: Int = 32, // config.py:57
    normalize: Boolean = true // config.py:58 — unit L2 norm so COSINE ≡ dot
)

object EmbeddingConfig { val default: EmbeddingConfig = EmbeddingConfig() }

final case class IndexConfig(
    nlist: Int = 128, // IVF cluster count, config.py:24
    nprobe: Int = 16 // clusters probed at search, config.py:25
)

object IndexConfig { val default: IndexConfig = IndexConfig() }

final case class SearchConfig(
    defaultK: Int = 3 // config.py:108
)

/** Field caps applied at insert time (reference milvus_store.py:50-55, 204-217). */
object FieldCaps {
  val Text = 65535
  val Source = 512
  val Filename = 256
  val Language = 32
}

/** Quality gates (reference quality_monitor.py:176-206). */
object QualityGates {
  val TokenRangeLo = 300
  val TokenRangeHi = 500
  val MinInRangeRatio = 0.70
  val MaxCoefficientOfVariation = 50.0
}
