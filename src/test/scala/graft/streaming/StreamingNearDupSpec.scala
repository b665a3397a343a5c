package graft.streaming

import graft.SparkTestBase
import graft.dedup.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingNearDupSpec extends SparkTestBase {

  private val base = (1 to 60).map(i => s"token$i").mkString(" ")
  private val nearDup = (1 to 58).map(i => s"token$i").mkString(" ") + " tokenX tokenY"
  private val other = (100 to 160).map(i => s"other$i").mkString(" ")

  test("near-dups arriving in LATER micro-batches are flagged against earlier residents") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDS().toDF("id", "text")
    val q = StreamingNearDup.detect(docs, "id", "text", jaccardThreshold = 0.5)
      .writeStream.format("memory").queryName("neardup_out").outputMode("append").start()
    try {
      input.addData((1L, base), (3L, other))
      q.processAllAvailable()
      input.addData((7L, nearDup)) // paraphrase arrives two batches later
      q.processAllAvailable()
      val hits = spark.table("neardup_out").as[NearDupHit].collect()
        .map(h => (h.id, h.dup_of)).distinct
      // 7 flags against the EARLIER 1; the unrelated 3 never pairs
      assert(hits.toSet == Set((7L, 1L)), s"hits=${hits.toSeq}")
      val ests = spark.table("neardup_out").as[NearDupHit].collect().map(_.est_jaccard)
      assert(ests.forall(_ >= 0.5))
    } finally q.stop()
  }

  test("streaming candidates agree with the batch LSH path on the same corpus") {
    import spark.implicits._
    val df = Seq((1L, base), (7L, nearDup), (3L, other)).toDF("id", "text")
    // batch truth: exact-verified pairs at the same banding config
    val batchPairs = Dedup
      .minHashLshPairs(df, "id", "text", shingleSize = 3, numHashes = 32, bands = 8,
        jaccardThreshold = 0.5)
      .collect().map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
      .toSet
    // streaming operator in batch execution (state starts empty)
    val streamHits = StreamingNearDup.detect(df, "id", "text", jaccardThreshold = 0.5)
      .collect().map(h => (math.min(h.id, h.dup_of), math.max(h.id, h.dup_of))).toSet
    assert(streamHits == batchPairs, s"stream=$streamHits batch=$batchPairs")
  }

  test("ttlMs > 0 derives a consistent timeout mode (batch run neither throws nor changes hits)") {
    import spark.implicits._
    val df = Seq((1L, base), (7L, nearDup), (3L, other)).toDF("id", "text")
    // the timeout MODE is derived from ttlMs inside nearDupHits so the
    // pair can never disagree — a NoTimeout + setTimeoutDuration
    // combination throws UnsupportedOperationException at runtime,
    // which is exactly what this batch execution would surface. In
    // batch, timeouts never FIRE, so the hit set must equal ttl=0's.
    val withTtl = StreamingNearDup
      .nearDupHits(StreamingNearDup.bandObservations(df, "id", "text"),
        jaccardThreshold = 0.5, ttlMs = 60000L)
      .collect().map(h => (h.id, h.dup_of)).toSet
    val without = StreamingNearDup
      .nearDupHits(StreamingNearDup.bandObservations(df, "id", "text"),
        jaccardThreshold = 0.5)
      .collect().map(h => (h.id, h.dup_of)).toSet
    assert(withTtl == without, s"ttl=$withTtl nottl=$without")
    assert(withTtl.nonEmpty)
  }

  test("maxPerBucket bounds state with FIFO eviction (recall trade is explicit)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDS().toDF("id", "text")
    // bucket capacity 1: resident 1 is evicted by 2 (an unrelated doc
    // CAN share no bucket — so feed the same doc text to force shared
    // buckets), after which a copy of 1 no longer matches anything
    val q = StreamingNearDup
      .nearDupHits(
        StreamingNearDup.bandObservations(docs, "id", "text"),
        jaccardThreshold = 0.9, maxPerBucket = 1)
      .writeStream.format("memory").queryName("neardup_evict").outputMode("append").start()
    try {
      input.addData((1L, base))
      q.processAllAvailable()
      input.addData((2L, base)) // fills every shared bucket, evicting 1
      q.processAllAvailable()
      input.addData((9L, base)) // matches resident 2, never evicted 1
      q.processAllAvailable()
      val hits = spark.table("neardup_evict").as[NearDupHit].collect()
        .map(h => (h.id, h.dup_of)).distinct.toSet
      assert(hits.contains((2L, 1L)) && hits.contains((9L, 2L)))
      assert(!hits.contains((9L, 1L)), s"evicted resident still matched: $hits")
    } finally q.stop()
  }
}
