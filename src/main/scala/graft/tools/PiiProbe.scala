package graft.tools

import java.util.concurrent.{Executors, TimeUnit}

/** Decides the q_pii_scrub curvature question (VERDICT r11 watch item):
  * the graded row ran 18.9× across the sf1→sf10 hop against a 12.5×
  * character decade — is the ~1.5× residual an algorithmic defect that
  * compounds at the next decade, or a one-time cache-to-DRAM
  * transition that a warmed benchmark at small scale hides?
  *
  * The probe isolates the regex engine from Spark entirely: the same
  * pattern-major batched loop `PiiScrub.scrubBatched` runs per
  * partition, executed here over in-memory corpora of GROWING TOTAL
  * SIZE but identical document-length distribution (real sf0.1 docs +
  * the bench noise suffix, replicated with per-replica tags so strings
  * are distinct objects — replication changes only the working-set
  * size, never the per-char work). Two readings per size:
  *
  *  - 32 threads, warm pass then timed pass — the shape Bench measures
  *    (LRU state after the warm pass is what differs across sizes);
  *  - 1 thread over a fixed 1-replica slice — per-char cost reference,
  *    flat by construction if the engine itself is scale-free.
  *
  * Interpretation contract: if 32-thread chars/s drops from the
  * cache-resident region (≤ tens of MB) to the DRAM region (hundreds
  * of MB+) and then stays FLAT as the corpus grows further decades,
  * the sf1→sf10 residual is the one-time transition — sf1's warmed
  * run was LLC/page-cache-assisted, sf10 is the steady state, and the
  * steady state is linear: no fix exists or is needed. Only a
  * CONTINUED decline in the DRAM region would indicate real curvature.
  *
  * WHAT IT FOUND (round 12; BASELINE.md addendum): neither — the
  * curvature theory is dead a different way. Single-thread rate is
  * SIZE-INDEPENDENT (3.7–4.2 Mchars/s at 4 MB and at 266 MB), and the
  * 32-thread total saturates at ~6–10 Mchars/s regardless of corpus
  * size — including fully-LLC-resident ones — on a host where 16
  * pure-CPU processes scale perfectly. The ceiling is the regex
  * engine's position-by-position attempt loop under concurrency (see
  * tools/PiiSpin for the variant attribution and [[graft.text.PiiScan]]
  * for the shipped fix: candidate-gated attempts, byte-identical
  * output, 13.4× at 32 threads).
  *
  * Run: `SPARK_DRIVER_MEM=16g sbt "runMain graft.tools.PiiProbe /root/testdata/sf0.1"`
  */
object PiiProbe {

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
    val baseChars = base.map(_.length.toLong).sum
    println(f"[pii-probe] base corpus ${base.length} docs, ${baseChars / 1e6}%.1f M chars (${2 * baseChars / 1e6}%.0f MB as UTF-16)")

    // single-thread reference on the 1-replica slice (per-char cost of
    // the engine itself, no concurrency, no size axis)
    val stRate = timed(1, replicate(base, 1))
    println(f"[pii-probe] 1 thread / 1 replica: ${stRate / 1e6}%.1f Mchars/s")

    // the size ladder: same length distribution, distinct strings,
    // 32 threads — each point is warm + timed like Bench. 256 replicas
    // (~1.3 GB UTF-16) is the decisive point: well past any LLC, so a
    // FLAT 64→256 hop certifies the steady state is linear and the
    // sf1→sf10 residual was the one-time cache transition.
    Seq(1, 4, 16, 64, 256).foreach { rep =>
      val corpus = replicate(base, rep)
      val totalChars = corpus.map(_.length.toLong).sum
      val rate = timed(32, corpus)
      println(f"[pii-probe] 32 threads / $rep%3d replicas (${2 * totalChars / 1e6}%5.0f MB): ${rate / 1e6}%.1f Mchars/s")
    }

    // thread-count ladder at FIXED 64-replica size: separates a shared
    // resource (total rate saturates: bandwidth/LLC) from per-thread
    // overhead (total rate scales with threads). The first probe run
    // found 32-thread total ≈ 1-thread total at this size — cores busy
    // but ~30× less efficient per thread — which, if it is a shared
    // hardware ceiling, also bounds any per-executor thread count.
    val fixed = replicate(base, 64)
    Seq(1, 2, 4, 8, 16, 32).foreach { t =>
      val rate = timed(t, fixed)
      println(f"[pii-probe] $t%2d threads / 64 replicas: ${rate / 1e6}%.1f Mchars/s (${rate / 1e6 / t}%.2f per thread)")
    }
  }

  /** rep distinct copies; the tag keeps byte content unique per replica
    * without changing lengths materially (3–4 chars on ~1k-char docs).
    */
  private def replicate(base: Array[String], rep: Int): Array[String] = {
    val out = new Array[String](base.length * rep)
    var r = 0
    while (r < rep) {
      var i = 0
      while (i < base.length) {
        out(r * base.length + i) = if (r == 0) new String(base(i)) else s"r$r ${base(i)}"
        i += 1
      }
      r += 1
    }
    out
  }

  /** chars/s of the pattern-major batched scrub over `corpus` with
    * `threads` workers on disjoint contiguous slices (the per-partition
    * execution shape, minus Spark). Warm full pass, then the timed one.
    */
  private def timed(threads: Int, corpus: Array[String]): Double = {
    val totalChars = corpus.map(_.length.toLong).sum
    def pass(): Long = {
      val pool = Executors.newFixedThreadPool(threads)
      val slice = (corpus.length + threads - 1) / threads
      val t0 = System.nanoTime()
      (0 until threads).foreach { t =>
        pool.execute { () =>
          val pats = graft.text.PiiScrub.Stages.map { case (p, r) =>
            (java.util.regex.Pattern.compile(p), r)
          }
          val lo = t * slice
          val hi = math.min(corpus.length, lo + slice)
          if (lo < hi) {
            // batch like scrubBatched: copy a batch, run stages
            // pattern-major across it, discard the result
            val Batch = 4096
            var b = lo
            while (b < hi) {
              val e = math.min(hi, b + Batch)
              val txt = new Array[String](e - b)
              var i = 0
              while (i < txt.length) { txt(i) = corpus(b + i); i += 1 }
              pats.foreach { case (p, r) =>
                var j = 0
                while (j < txt.length) {
                  txt(j) = p.matcher(txt(j)).replaceAll(r)
                  j += 1
                }
              }
              b = e
            }
          }
        }
      }
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.HOURS)
      System.nanoTime() - t0
    }
    pass() // warm: JIT + LRU state, exactly what Bench's warm run does
    val ns = pass()
    totalChars.toDouble * 1e9 / ns
  }
}
