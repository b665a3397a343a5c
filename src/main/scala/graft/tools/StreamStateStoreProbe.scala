package graft.tools

import graft.streaming.{NearDupHit, StreamingNearDup}
import org.apache.spark.sql.SparkSession

/** REAL micro-batch run of the streaming near-dup (state store and
  * all) — [[StreamNearDupProbe]] runs the operator in batch execution,
  * which never touches a state store, so the r15 "product encoder
  * helps the state-store path" claim had no engine number behind it.
  * This probe streams the corpus through a file source (one micro-batch
  * per parquet part-file via maxFilesPerTrigger), so every batch pays
  * the real store round-trip: load bucket state, run the estimator,
  * write state back, commit the delta.
  *
  * The provider is pinned PER JVM (the pinned-A/B discipline —
  * shared-JVM route pairs varied ±40% by run order in r15):
  *   GRAFT_STATE_PROVIDER=rocksdb  → RocksDBStateStoreProvider
  *   GRAFT_STATE_PROVIDER=hdfs     → default HDFS-backed in-memory store
  *
  * Usage: GRAFT_STATE_PROVIDER=rocksdb tools/run_main.sh \
  *          graft.tools.StreamStateStoreProbe <dir> ...
  *
  * Bounded-state replay (VERDICT r16 #2 / next-round #1): the r16
  * UNBOUNDED fourth-decade replay died ENOSPC — 16 micro-batches of
  * full-corpus state versioned into a 19-23 GB checkpoint on one disk
  * (records/probe_r16_statestore.log). That was the wrong experiment:
  * StreamingNearDup's own scaladoc prescribes bounding resident state
  * on real streams with the TTL and per-bucket cap. Those knobs ride
  * env vars here so the fourth-decade number can be produced under the
  * PRODUCTION configuration, pinned per JVM like the provider:
  *   GRAFT_SS_TTL_MS  → detect(ttlMs=...)   (processing-time expiry;
  *                      in a replay, buckets idle for one inter-batch
  *                      gap age out — the recall trade is duplicates
  *                      farther apart in TIME than the TTL)
  *   GRAFT_SS_MAXPB   → detect(maxPerBucket=...) (FIFO resident cap;
  *                      the recall trade is >cap-deep duplicate piles)
  */
object StreamStateStoreProbe {

  import ProbeTiming.time

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/scaledata/sf1")
    val provider = sys.env.getOrElse("GRAFT_STATE_PROVIDER", "hdfs")
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
    if (provider == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ttlMs = sys.env.getOrElse("GRAFT_SS_TTL_MS", "0").toLong
    val maxPb = sys.env.getOrElse("GRAFT_SS_MAXPB", "64").toInt
    println(s"[ssprobe] config provider=$provider ttl_ms=$ttlMs max_per_bucket=$maxPb")
    println(f"[ssprobe] ${"dir"}%-28s ${"provider"}%8s ${"docs"}%8s ${"batches"}%8s ${"sec"}%8s ${"hits"}%9s")
    val nParts = sys.env.getOrElse("GRAFT_SS_BATCHES", "16").toInt
    try dirs.foreach { dir =>
      val path = s"$dir/documents.parquet"
      // Stage (doc_id, text) into a temp dir with a FIXED part-file
      // count: the file source triggers one micro-batch per file, so
      // the batch count — and with it how many state round-trips the
      // run pays — is identical across providers and input layouts
      // (testdata ships single-file tables, which the file stream
      // source rejects outright as a basePath).
      val staged = java.nio.file.Files.createTempDirectory("graft-ssprobe-in").toString
      spark.read.parquet(path).select("doc_id", "text")
        .repartition(nParts).write.mode("overwrite").parquet(staged)
      val schema = spark.read.parquet(staged).schema
      val nDocs = spark.read.parquet(staged).count()
      val ckpt = java.nio.file.Files.createTempDirectory("graft-ssprobe").toString
      val hits = new java.util.concurrent.atomic.AtomicLong(0)
      val batches = new java.util.concurrent.atomic.AtomicLong(0)
      // GRAFT_SS_DISTINCT=1: also accumulate DISTINCT (id, dup_of)
      // pairs driver-side, so a bounded-TTL run's recall can be read
      // against the batch-mode distinct-pair ceiling (the `hits`
      // column is raw per-band emissions — a pair colliding in k of
      // the 8 bands counts k times, the r16 probe convention).
      val wantDistinct = sys.env.get("GRAFT_SS_DISTINCT").contains("1")
      val distinct = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Long)]()
      val docs = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1) // one micro-batch per part-file
        .parquet(staged)
      val stream = StreamingNearDup.detect(docs, "doc_id", "text",
        maxPerBucket = maxPb, ttlMs = ttlMs)
      // With ttlMs > 0 the operator runs under ProcessingTimeTimeout,
      // where processAllAvailable() is NOT a usable barrier: the engine
      // keeps re-triggering (empty) sweep batches so `noNewData` never
      // sticks (the StreamingNearDupSpec TTL test documents the same
      // trap). Completion is instead "every staged input row consumed",
      // tracked through a listener — numInputRows is reported AFTER a
      // batch (and its foreachBatch sink) commits, so once the count
      // reaches nDocs every hit has been counted; sweep-only batches
      // after that emit nothing.
      val consumed = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          consumed.addAndGet(e.progress.numInputRows)
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      if (ttlMs > 0) spark.streams.addListener(listener)
      val (_, sec) = time {
        val q = stream.writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[NearDupHit], _: Long) =>
            if (wantDistinct) {
              val rows = b.collect()
              hits.addAndGet(rows.length.toLong)
              rows.foreach(h => distinct.add((h.id, h.dup_of)))
            } else hits.addAndGet(b.count())
            batches.incrementAndGet(); ()
          }
          .outputMode("append").start()
        if (ttlMs > 0) {
          val deadline = System.nanoTime() + 4L * 3600 * 1000 * 1000 * 1000
          while (consumed.get() < nDocs && System.nanoTime() < deadline) Thread.sleep(200)
          if (consumed.get() < nDocs)
            println(s"[ssprobe] WARN input not drained (${consumed.get()}/$nDocs)")
        } else q.processAllAvailable()
        q.stop()
      }
      if (ttlMs > 0) spark.streams.removeListener(listener)
      println(f"[ssprobe] $dir%-28s $provider%8s $nDocs%8d ${batches.get()}%8d $sec%8.2f ${hits.get()}%9d" +
        (if (wantDistinct) s" distinct_pairs=${distinct.size}" else ""))
      distinct.clear()
      Seq(staged, ckpt).foreach { d =>
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala.toSeq
          .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    } finally {
      // Unload every state-store provider SYNCHRONOUSLY before JVM
      // exit, on EVERY exit path: q.stop()/spark.stop() leave loaded
      // RocksDB instances to lazy teardown, and the r17 probe's last
      // RocksDB run segfaulted when a native background-compaction
      // thread invoked the JNI logger
      // (rocksdb::LoggerJniCallback::Logv) mid-shutdown.
      // StateStore.stop() closes the providers (joining native
      // background work) while the JVM is still fully alive, removing
      // the race window. In a finally so a mid-replay failure — e.g.
      // the ENOSPC this probe hit in r16 — exits with ITS OWN
      // stack trace instead of racing teardown and burying the real
      // diagnosis under an hs_err crash dump (ADVICE-class catch, r18
      // self-review).
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      spark.stop()
    }
  }
}
