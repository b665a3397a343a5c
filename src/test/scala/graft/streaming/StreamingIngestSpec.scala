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

  test("session_window sessionization finalizes sessions across micro-batches at the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val events = input.toDS().toDF("ts", "user_id")
    val q = StreamingIngest
      .sessionize(events, gap = "30 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("sessions_out").outputMode("append").start()
    try {
      // one session: two events 10 min apart
      input.addData((t("2026-01-01 10:00:00"), "u1"), (t("2026-01-01 10:10:00"), "u1"))
      q.processAllAvailable()
      // far-future event advances the watermark past the session's close
      input.addData((t("2026-01-01 13:00:00"), "u1"))
      q.processAllAvailable()
      input.addData((t("2026-01-01 16:00:00"), "u1"))
      q.processAllAvailable()

      val rows = spark.table("sessions_out")
        .orderBy("session_start")
        .collect()
        .map(r => (r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3)))
      // first session merged both events and closed at last_event + gap
      assert(rows.nonEmpty)
      assert(rows(0) == ("2026-01-01 10:00:00.0", "2026-01-01 10:40:00.0", 2L))
    } finally q.stop()
  }

  test("session_window sessionization matches gap semantics in batch mode") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (t("2026-01-01 10:00:00"), "u1"), (t("2026-01-01 10:10:00"), "u1"),
      (t("2026-01-01 12:00:00"), "u1"), (t("2026-01-01 10:05:00"), "u2")
    ).toDF("ts", "user_id")
    val out = StreamingIngest.sessionize(events)
      .orderBy("user_id", "session_start")
      .collect()
      .map(r => (r.getString(0), r.getLong(3)))
    assert(out.toSeq == Seq(("u1", 2L), ("u1", 1L), ("u2", 1L)))
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

  test("hourly event windows: stream (append, watermark-finalized) equals batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val data = Seq(
      (t("2026-01-01 10:05:00"), "click", 1.0),
      (t("2026-01-01 10:55:00"), "click", 2.0),
      (t("2026-01-01 11:05:00"), "view", 3.0),
      (t("2026-01-01 11:20:00"), "click", 4.0))
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val q = StreamingIngest
      .hourlyEventCounts(input.toDS().toDF("ts", "event_type", "value"))
      .writeStream.format("memory").queryName("hourly_out").outputMode("append").start()
    try {
      // data split across micro-batches; a far-future sentinel advances
      // the watermark past every real window so append mode emits them
      input.addData(data.take(2))
      q.processAllAvailable()
      input.addData(data.drop(2))
      q.processAllAvailable()
      input.addData((t("2026-01-02 00:00:00"), "sentinel", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val batch = StreamingIngest.hourlyEventCounts(data.toDF("ts", "event_type", "value"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed == batch, s"stream $streamed vs batch $batch")
    } finally q.stop()
  }
}
