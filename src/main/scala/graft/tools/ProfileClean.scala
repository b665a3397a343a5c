package graft.tools

import graft.clean.TextCleaner

/** One-off per-stage cost profile of a RegexChain battery on the bench
  * corpus (driver-side, single-threaded — relative cost only), plus
  * distributed timing variants for the pii mode. Run:
  * `sbt "runMain graft.tools.ProfileClean /root/testdata/sf0.1 [pii]"`.
  *
  * This tool produced the two round-8 findings: (1) ~75% of the
  * cleaning battery's CPU sat in single-char-class stages (now the
  * RegexChain fast path); (2) interleaving several compiled Patterns
  * per row stops scaling across threads (megamorphic Matcher dispatch)
  * — a 4-thread run of the 4-stage PII chain matched ONE thread's wall
  * time until execution went pattern-major (PiiScrub.scrubBatched).
  */
object ProfileClean {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pii = args.length > 1 && args(1) == "pii"
    val noise =
      if (pii)
        " contact john.doe@example.com or +82 10-1234-5678 backup 010 1234 5678 ip 192.168.0.1 card 1234-5678-9012-3456 done"
      else
        " </div> {{#head}}tpl{{/head}} {% if x %} ${var} " +
          "see https://example.com/abc?q=1 and www.test.com here " +
          "Copyright 2024 All Rights Reserved Page 3 of 7 " +
          "alpha = beta & gamma 페이지"
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
      .select("text").collect().map(r =>
        if (pii) s"${r.getString(0)}$noise" else s"<div class='x'> ${r.getString(0)}$noise")
    println(s"[profile] ${docs.length} docs, total chars ${docs.map(_.length.toLong).sum}")
    val stages = if (pii) graft.text.PiiScrub.Stages else TextCleaner.BatteryStages
    val compiled = stages.map { case (p, _) => java.util.regex.Pattern.compile(p) }
    // warm-up pass, then timed pass, stage-major
    var cur = docs.toArray
    (0 until 2).foreach { round =>
      cur = docs.toArray
      val times = new Array[Long](stages.length)
      stages.indices.foreach { i =>
        val t0 = System.nanoTime()
        cur = cur.map(s => compiled(i).matcher(s).replaceAll(stages(i)._2))
        times(i) = System.nanoTime() - t0
      }
      if (round == 1) {
        val total = times.sum / 1e6
        println(f"[profile] total ${total}%.0f ms")
        times.zipWithIndex.sortBy(-_._1).take(15).foreach { case (t, i) =>
          val p = stages(i)._1
          println(f"[profile] stage $i%2d  ${t / 1e6}%7.1f ms  ${p.take(60)}")
        }
      }
    }

    if (pii) {
      // distributed variants on local[4], warmed then timed
      import org.apache.spark.sql.functions._
      val docs32 = spark.read.parquet(s"${args(0)}/documents.parquet").repartition(4)
      def time(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        df.write.mode("overwrite").format("noop").save()
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        println(f"[profile] dist $tag  ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val suffixed = concat(col("text"), lit(noise))
      time("scrub-expr")(docs32.select(col("doc_id"), graft.text.PiiScrub.scrub(suffixed).as("s")))
      import org.apache.spark.sql.Encoders
      implicit val enc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
      time("scrub-batched")(graft.text.PiiScrub.scrubBatched(
        docs32.select(col("doc_id").cast("long"), suffixed).as[(Long, String)](enc)).toDF("doc_id", "s"))
    }
    spark.stop()
  }
}
