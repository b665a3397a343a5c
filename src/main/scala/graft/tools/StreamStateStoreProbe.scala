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
    println(f"[ssprobe] ${"dir"}%-28s ${"provider"}%8s ${"docs"}%8s ${"batches"}%8s ${"sec"}%8s ${"hits"}%9s")
    val nParts = sys.env.getOrElse("GRAFT_SS_BATCHES", "16").toInt
    dirs.foreach { dir =>
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
      val docs = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1) // one micro-batch per part-file
        .parquet(staged)
      val stream = StreamingNearDup.detect(docs, "doc_id", "text")
      val (_, sec) = time {
        val q = stream.writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.Dataset[NearDupHit], _: Long) =>
            hits.addAndGet(b.count()); batches.incrementAndGet(); ()
          }
          .outputMode("append").start()
        q.processAllAvailable()
        q.stop()
      }
      println(f"[ssprobe] $dir%-28s $provider%8s $nDocs%8d ${batches.get()}%8d $sec%8.2f ${hits.get()}%9d")
      Seq(staged, ckpt).foreach { d =>
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala.toSeq
          .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    spark.stop()
  }
}
