package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One deduplicatable unit flowing through a streaming ingest: the
  * normalized-content hash is the dedup key, the id breaks keep-first
  * ties deterministically inside a micro-batch.
  */
final case class DedupEvent(content_hash: String, chunk_id: String, text: String)

/** Streaming (cross-micro-batch) deduplication — the piece the
  * per-batch `Dedup.exactDedup` in [[StreamingIngest.transformBatch]]
  * cannot provide: a duplicate arriving three micro-batches after the
  * original must still be dropped. Two tiers, Spark-first:
  *
  *  1. [[exactStreamingDedup]] / [[exactStreamingDedupBounded]] —
  *     Spark's built-in stateful `dropDuplicates` (/'WithinWatermark')
  *     keyed on the content hash. Use when "drop the dup" is all
  *     that's needed; the watermark variant bounds state for unbounded
  *     streams.
  *  2. [[keepFirstAcrossBatches]] — custom state via
  *     `flatMapGroupsWithState` when the pipeline also wants the
  *     duplicate COUNT per surviving chunk (dedup telemetry at train
  *     time: how much of the crawl was redundant?).
  *
  * At 100 TB: state is one entry per DISTINCT content hash — uniform
  * md5 keys, no skew; size it with the RocksDB state store
  * (`spark.sql.streaming.stateStore.providerClass`) and bound it with
  * the watermark variant or a `GroupStateTimeout` unless the corpus is
  * genuinely append-forever.
  */
object StreamingDedup {

  /** Attach the dedup key: md5 over lowercase/whitespace-normalized
    * text (same normalization as the batch K5 operator, so batch and
    * stream agree on what "identical" means).
    */
  def withContentHash(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("content_hash", Dedup.contentHash(col(textCol)))

  /** Exact streaming dedup with UNBOUNDED state — Spark's stateful
    * dropDuplicates. Works identically on batch DataFrames (where it
    * degenerates to a plain distinct-by-key).
    */
  def exactStreamingDedup(docs: DataFrame, textCol: String): DataFrame =
    withContentHash(docs, textCol).dropDuplicates("content_hash")

  /** Exact streaming dedup with watermark-BOUNDED state: duplicates
    * are only guaranteed dropped while they arrive within the
    * watermark delay of the original — the standard state/recall
    * tradeoff for unbounded streams.
    */
  def exactStreamingDedupBounded(
      docs: DataFrame,
      textCol: String,
      eventTimeCol: String,
      delay: String
  ): DataFrame =
    withContentHash(docs, textCol)
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Keep-first across ALL micro-batches with per-key duplicate
    * accounting. Emits each content hash exactly once — on first
    * sight, choosing the lowest chunk_id inside that first batch for
    * determinism — and keeps a running duplicate count in state.
    * Query the final counts via [[duplicateCounts]]-style state
    * introspection or emit-side metrics; here the count rides the
    * state so a later timeout policy can expose it.
    *
    * Also correct in plain batch execution (state starts empty, one
    * invocation per key), so batch backfills and the streaming path
    * share semantics.
    */
  def keepFirstAcrossBatches(
      ds: Dataset[DedupEvent],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout()
  ): Dataset[DedupEvent] = {
    implicit val eventEnc = Encoders.product[DedupEvent]
    implicit val longEnc = Encoders.scalaLong
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.content_hash)
      .flatMapGroupsWithState[Long, DedupEvent](OutputMode.Append(), timeout) {
        (_: String, events: Iterator[DedupEvent], state: GroupState[Long]) =>
          val batch = events.toSeq
          if (state.exists) {
            // key seen in an earlier micro-batch: everything is a dup
            state.update(state.get + batch.size)
            Iterator.empty
          } else {
            val first = batch.minBy(_.chunk_id)
            state.update(batch.size - 1L) // dups swallowed so far
            Iterator.single(first)
          }
      }
  }
}
