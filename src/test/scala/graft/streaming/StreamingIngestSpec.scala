package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingIngestSpec extends SparkTestBase {

  test("streaming ingest processes backlog into partitioned collections (AvailableNow)") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-stream-in").toString
    val store = Files.createTempDirectory("graft-stream-store").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString

    val docs = Seq(
      ("srcA", "folder1", "the quick brown fox jumps over the lazy dog many many times to make text"),
      ("srcB", "folder2", "another document with plenty of content for the streaming pipeline test run")
    ).toDF("source", "folder_name", "text")
    docs.write.parquet(s"$in/batch0.parquet")

    val q = StreamingIngest.start(spark, in, store, ckpt, docs.schema)
    q.awaitTermination(60000)

    val out = spark.read.parquet(store)
    assert(out.count() >= 2)
    val collections = out.select("collection").distinct().as[String].collect().toSet
    assert(collections == Set("docs_folder1", "docs_folder2"))
    assert(out.columns.contains("embedding"))
    assert(out.columns.contains("chunk_id"))

    // exactly-once: restarting over the same checkpoint adds nothing
    val q2 = StreamingIngest.start(spark, in, store, ckpt, docs.schema)
    q2.awaitTermination(60000)
    assert(spark.read.parquet(store).count() == out.count())
  }

  test("hourly event windows with watermark (batch-mode plan)") {
    import spark.implicits._
    val events = Seq(
      (java.sql.Timestamp.valueOf("2026-01-01 10:05:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2026-01-01 10:55:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2026-01-01 11:05:00"), "view", 3.0)
    ).toDF("ts", "event_type", "value")
    val out = StreamingIngest.hourlyEventCounts(events).orderBy("window_start", "event_type").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2)
    assert(out(0).getAs[Double]("sum_value") == 3.0)
  }
}
