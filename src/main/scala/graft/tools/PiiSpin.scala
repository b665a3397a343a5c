package graft.tools

import java.lang.management.ManagementFactory
import java.util.concurrent.{Executors, TimeUnit}
import scala.jdk.CollectionConverters._

/** Attribution harness for the PiiProbe concurrency ceiling: 32 regex
  * threads total ~2× one thread's throughput on a ≥16-real-core host
  * (pure-CPU processes scale perfectly), the ceiling is identical for a
  * fully-cache-resident 4 MB corpus and a 1 GB one, and the threads
  * burn real CPU the whole time. Variants isolate the usual suspects:
  *
  *  - base     — p.matcher(s).replaceAll(r), the scrubBatched shape
  *  - private  — same, but each thread deep-copies its slice first
  *               (rules out shared-backing-array / NUMA-line effects)
  *  - find     — match loop only, no replacement string building
  *               (isolates search from StringBuilder/append work)
  *  - noalloc  — reuses one Matcher per (thread, pattern) via reset()
  *               (isolates per-call Matcher allocation)
  *
  * Each point prints wall time AND the GC-time delta for the pass —
  * if GC accounts for the missing 28 cores it shows here.
  *
  * Run: tools/run_main.sh graft.tools.PiiSpin /root/testdata/sf0.1 [threads]
  */
object PiiSpin {

  private val Noise =
    " contact john.doe@example.com or +82 10-1234-5678 backup 010 1234 5678 ip 192.168.0.1 card 1234-5678-9012-3456 done"

  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base: Array[String] = spark.read
      .parquet(s"${args(0)}/documents.parquet")
      .select("text").collect().map(r => r.getString(0) + Noise)
    spark.stop()
    val threads = if (args.length > 1) args(1).toInt else 32

    val corpus = {
      val rep = 64
      val out = new Array[String](base.length * rep)
      var r = 0
      while (r < rep) {
        var i = 0
        while (i < base.length) {
          out(r * base.length + i) = if (r == 0) base(i) else s"r$r ${base(i)}"
          i += 1
        }
        r += 1
      }
      out
    }
    val chars = corpus.map(_.length.toLong).sum
    println(f"[pii-spin] corpus ${corpus.length} docs, ${chars / 1e6}%.0f Mchars, $threads threads, gc=${ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getName).mkString("+")}")

    // repeat mode: the same config N times in ONE JVM — stable-within /
    // varying-across-JVMs fingerprints JIT compilation luck (inline
    // caches frozen at whatever receiver mix C2 saw), not the data.
    if (args.length > 2) {
      val n = args(2).toInt
      run("base", threads, corpus, chars) // warm
      (1 to n).foreach(_ => run("base", threads, corpus, chars, report = true))
    } else Seq("base", "private", "find", "noalloc", "gated").foreach { variant =>
      run(variant, threads, corpus, chars) // warm
      run(variant, threads, corpus, chars, report = true)
    }
  }

  private def gcMs: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

  private def run(variant: String, threads: Int, corpus: Array[String],
                  chars: Long, report: Boolean = false): Unit = {
    val pool = Executors.newFixedThreadPool(threads)
    val slice = (corpus.length + threads - 1) / threads
    val gc0 = gcMs
    val t0 = System.nanoTime()
    (0 until threads).foreach { t =>
      pool.execute { () =>
        val pats = graft.text.PiiScrub.Stages.map { case (p, r) =>
          (java.util.regex.Pattern.compile(p), r)
        }
        val lo = t * slice
        val hi = math.min(corpus.length, lo + slice)
        if (lo < hi) {
          val txt = new Array[String](hi - lo)
          var i = 0
          while (i < txt.length) {
            txt(i) =
              if (variant == "private") new String(corpus(lo + i).toCharArray)
              else corpus(lo + i)
            i += 1
          }
          variant match {
            case "gated" =>
              val scr = new graft.text.PiiScan.Scrubber()
              var j = 0
              while (j < txt.length) {
                txt(j) = scr.scrub(txt(j))
                j += 1
              }
            case "find" =>
              pats.foreach { case (p, _) =>
                var j = 0
                var n = 0L
                while (j < txt.length) {
                  val m = p.matcher(txt(j))
                  while (m.find()) n += 1
                  j += 1
                }
                if (n < 0) println(n) // keep the loop alive
              }
            case "noalloc" =>
              val ms = pats.map { case (p, _) => p.matcher("") }
              var s = 0
              while (s < pats.length) {
                val m = ms(s)
                val r = pats(s)._2
                var j = 0
                while (j < txt.length) {
                  m.reset(txt(j))
                  txt(j) = m.replaceAll(r)
                  j += 1
                }
                s += 1
              }
            case _ =>
              pats.foreach { case (p, r) =>
                var j = 0
                while (j < txt.length) {
                  txt(j) = p.matcher(txt(j)).replaceAll(r)
                  j += 1
                }
              }
          }
        }
      }
    }
    pool.shutdown()
    pool.awaitTermination(1, TimeUnit.HOURS)
    val wallMs = (System.nanoTime() - t0) / 1e6
    if (report)
      println(f"[pii-spin] $variant%-8s ${chars / 1e3 / wallMs}%6.1f Mchars/s  wall ${wallMs / 1e3}%6.1f s  gc ${(gcMs - gc0) / 1e3}%5.1f s")
  }
}
