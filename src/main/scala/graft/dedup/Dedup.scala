package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family. K5 (exact, reference chunker.py:182-207) plus
  * the near-dup operators a large-scale training-data pipeline needs
  * (MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine) — all
  * expressed as declarative plans so Catalyst handles pushdown and AQE
  * handles skew.
  */
object Dedup
    extends TextNormalization
    with ExactDedupOps
    with MinHashLshOps
    with DecontamOps
    with ClusterOps
    with JaccardJoinOps
    with SimHashOps
    with EmbedNearDupOps
    with SpanScrubOps
