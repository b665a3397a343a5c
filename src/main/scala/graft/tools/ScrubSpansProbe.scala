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

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/scaledata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_SCRUB_PF=true|false pins one route (the sf100 attempt must
    // not die in the known-infeasible route before measuring the other)
    val routes = sys.env.get("GRAFT_SCRUB_PF") match {
      case Some(v) => Seq(v.toBoolean)
      case None    => Seq(false, true)
    }
    println(f"[scrubprobe] ${"dir"}%-28s ${"docs"}%8s ${"prefilter"}%9s ${"sec"}%8s ${"n_removed_sum"}%14s")
    for (dir <- dirs; pf <- routes) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val (sum, sec) = time {
        graft.dedup.Dedup
          .scrubDuplicateSpans(docs, "doc_id", "text", n = 8, hashPrefilter = Some(pf))
          .agg(org.apache.spark.sql.functions.sum(col("n_removed")))
          .head().getLong(0)
      }
      println(f"[scrubprobe] $dir%-28s $n%8d $pf%9s $sec%8.2f $sum%14d")
    }
    spark.stop()
  }
}
