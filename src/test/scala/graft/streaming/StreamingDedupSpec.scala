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

  test("keepFirstAcrossBatches shares semantics with batch execution (backfill path)") {
    import spark.implicits._
    val batch = Seq(
      ev("c2", "same text"), ev("c1", "Same   TEXT"), ev("c9", "different")
    ).toDS()
    val kept = StreamingDedup.keepFirstAcrossBatches(batch).collect().map(_.chunk_id).toSet
    assert(kept == Set("c1", "c9"))
  }
}
