package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends SparkTestBase {

  private def ev(id: String, text: String): DedupEvent = {
    val norm = text.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
    DedupEvent(md5, id, text)
  }

  test("keepFirstAcrossBatches drops duplicates that arrive in LATER micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DedupEvent]
    val q = StreamingDedup.keepFirstAcrossBatches(input.toDS())
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      // batch 1: a, dup-of-a (same text), b — keep-first by chunk_id
      input.addData(ev("c2", "Hello   World"), ev("c1", "hello world"), ev("c3", "other text"))
      q.processAllAvailable()
      // batch 2: duplicate of a from a LATER batch + a fresh doc
      input.addData(ev("c4", "HELLO WORLD"), ev("c5", "brand new content"))
      q.processAllAvailable()

      val kept = spark.table("dedup_out").as[DedupEvent].collect().map(_.chunk_id).toSet
      // c1 wins its batch (lowest id); c4 (cross-batch dup) suppressed
      assert(kept == Set("c1", "c3", "c5"))
    } finally q.stop()
  }

  test("exactStreamingDedup drops cross-batch duplicates via built-in stateful dropDuplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val docs = input.toDS().toDF("id", "text")
    val q = StreamingDedup.exactStreamingDedup(docs, "text")
      .writeStream.format("memory").queryName("dedup_builtin").outputMode("append").start()
    try {
      input.addData(("a", "some text"), ("b", "unique one"))
      q.processAllAvailable()
      input.addData(("c", "SOME   text"), ("d", "another unique"))
      q.processAllAvailable()
      val ids = spark.table("dedup_builtin").select("id").as[String].collect().toSet
      assert(ids.contains("b") && ids.contains("d"))
      assert(!(ids.contains("a") && ids.contains("c"))) // only one survivor of the pair
      assert(ids.size == 3)
    } finally q.stop()
  }

  test("RocksDB state store + checkpoint restart: keys seen before the restart stay suppressed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // keepFirstAcrossBatches' Long state through a real on-disk store
    // and a stop/restart: a duplicate of a PRE-restart key must still
    // be swallowed by the restarted query (state recovered), and a
    // fresh key must still emit (the store stays writable).
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sdd-ckpt").toString
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val kept = new java.util.concurrent.ConcurrentLinkedQueue[String]
    try {
      val input = MemoryStream[DedupEvent]
      def start() = StreamingDedup.keepFirstAcrossBatches(input.toDS())
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[DedupEvent], _: Long) =>
          batch.collect().foreach(e => kept.add(e.chunk_id))
        }
        .outputMode("append").start()
      val q1 = start()
      try {
        input.addData(ev("c1", "hello world"), ev("c2", "other text"))
        q1.processAllAvailable()
      } finally q1.stop()
      import scala.jdk.CollectionConverters._
      assert(kept.asScala.toSet == Set("c1", "c2"))
      val q2 = start()
      try {
        input.addData(ev("c3", "HELLO   world"), ev("c4", "brand new content"))
        q2.processAllAvailable()
      } finally q2.stop()
      // c3 duplicates the pre-restart c1 -> suppressed; c4 is fresh
      assert(kept.asScala.toSet == Set("c1", "c2", "c4"), s"kept=$kept")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("keepFirstAcrossBatches shares semantics with batch execution (backfill path)") {
    import spark.implicits._
    val batch = Seq(
      ev("c2", "same text"), ev("c1", "Same   TEXT"), ev("c9", "different")
    ).toDS()
    val kept = StreamingDedup.keepFirstAcrossBatches(batch).collect().map(_.chunk_id).toSet
    assert(kept == Set("c1", "c9"))
  }
}
