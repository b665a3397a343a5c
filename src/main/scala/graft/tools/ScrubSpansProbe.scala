package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decade probe for the FULL-CORPUS duplicate-span scrub
  * ([[graft.dedup.Dedup.scrubDuplicateSpans]]) after the round-14
  * span-merge rewrite — the graded q_scrub_spans row is capped at the
  * replica-0 slice (sf-flat by design), so the OPERATOR's decade curve
  * needs its own measurement, like StreamNearDupProbe for the
  * streaming near-dup. Runs the operator over each corpus with both
  * prefilter routes (unless the arg list pins one), sinking to a
  * count+checksum aggregate so the measured cost is the scrub, not a
  * dump.
  *
  * Usage: runMain graft.tools.ScrubSpansProbe [dir ...]
  */
object ScrubSpansProbe {

  import ProbeTiming.time

  /** Accumulates shuffle-write + spill bytes across tasks — on a real
    * cluster the exchange VOLUME, not local wall-clock, is what the
    * prefilter trades against (the r15 sf100r A/B tied on seconds while
    * differing ~50 GB in spill; this listener makes that visible in the
    * probe line instead of `df -h` archaeology).
    */
  private final class VolumeListener extends org.apache.spark.scheduler.SparkListener {
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    val diskSpill = new java.util.concurrent.atomic.AtomicLong(0)
    override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        diskSpill.addAndGet(m.diskBytesSpilled)
      }
    }
    def reset(): Unit = { shuffleWrite.set(0); diskSpill.set(0) }

    /** Listener-bus events drain asynchronously after the blocking
      * action returns; a fixed sleep under-counts on a loaded host
      * (ADVICE r15 #4). Poll the totals until they hold still for a
      * full second (bounded at 15 s so a wedged bus can't hang the
      * probe — if the bound trips, the figures are drain-window-coarse
      * and the probe says so).
      */
    def settle(): Unit = {
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var last = (shuffleWrite.get(), diskSpill.get())
      var stableSince = System.nanoTime()
      var settled = false
      while (!settled && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val now = (shuffleWrite.get(), diskSpill.get())
        if (now != last) { last = now; stableSince = System.nanoTime() }
        else settled = (System.nanoTime() - stableSince) >= 1000L * 1000 * 1000
      }
      // warn only on a GENUINE timeout — the old `now >= deadline`
      // check also fired when stability landed exactly at the deadline
      // (ADVICE r16), turning a clean drain into a scary log line
      if (!settled)
        println("[scrubprobe] WARN listener bus did not settle in 15s; GB figures may be low")
    }
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/scaledata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vol = new VolumeListener
    spark.sparkContext.addSparkListener(vol)
    // GRAFT_SCRUB_PF=true|false pins one route (the sf100 attempt must
    // not die in the known-infeasible route before measuring the other)
    val routes = sys.env.get("GRAFT_SCRUB_PF") match {
      case Some(v) => Seq(v.toBoolean)
      case None    => Seq(false, true)
    }
    println(f"[scrubprobe] ${"dir"}%-28s ${"docs"}%8s ${"prefilter"}%9s ${"sec"}%8s ${"n_removed_sum"}%14s ${"shuffle_gb"}%10s ${"spill_gb"}%9s")
    for (dir <- dirs; pf <- routes) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      vol.reset()
      val (sum, sec) = time {
        graft.dedup.Dedup
          .scrubDuplicateSpans(docs, "doc_id", "text", n = 8, hashPrefilter = Some(pf))
          .agg(org.apache.spark.sql.functions.sum(col("n_removed")))
          .head().getLong(0)
      }
      // listener events drain asynchronously; poll until stable
      // (listenerBus.waitUntilEmpty is private[spark])
      vol.settle()
      val shufGb = vol.shuffleWrite.get() / 1e9
      val spillGb = vol.diskSpill.get() / 1e9
      println(f"[scrubprobe] $dir%-28s $n%8d $pf%9s $sec%8.2f $sum%14d $shufGb%10.2f $spillGb%9.2f")
    }
    spark.stop()
  }
}
