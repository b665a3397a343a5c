package graft.tools

import graft.clean.TextCleaner

/** One-off per-stage cost profile of the cleaning battery on the bench
  * corpus (driver-side, single-threaded — relative cost only). Run:
  * `sbt "runMain graft.tools.ProfileClean /root/testdata/sf0.1"`.
  */
object ProfileClean {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val noise = " </div> {{#head}}tpl{{/head}} {% if x %} ${var} " +
      "see https://example.com/abc?q=1 and www.test.com here " +
      "Copyright 2024 All Rights Reserved Page 3 of 7 " +
      "alpha = beta & gamma 페이지"
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
      .select("text").collect().map(r => s"<div class='x'> ${r.getString(0)}$noise")
    println(s"[profile] ${docs.length} docs, total chars ${docs.map(_.length.toLong).sum}")
    val stages = TextCleaner.BatteryStages
    val compiled = stages.map { case (p, _) => java.util.regex.Pattern.compile(p) }
    // warm-up pass
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
    spark.stop()
  }
}
