package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Uncapped fourth-decade engine probe for the SimHash near-dup family
  * (r15): the graded q_simhash/q_simhash_fast rows answer-check the
  * replica-0 slice because their exhaustive self-join ORACLES are
  * quadratic, but the r13 sweep also recorded the UNCAPPED engine run
  * TIMEOUT/OOM-ing at sf100 — on the maximal-duplication fixture,
  * where near the whole corpus sits inside one Hamming-6 family and
  * the verified pair OUTPUT itself is quadratic. On the realistic-
  * duplication fixtures (ScaleUp dupRatePct=15; per-doc-salted
  * majority → ~random signatures) the output is linear-ish and the
  * adaptive block knob bounds false-positive candidates, so the
  * operator should complete at 5M docs — this probe records that.
  * Same shape as the graded rows (maxHamming = 6, adaptive blocks,
  * production xxh64 hash), count+sum sink so the measured cost is the
  * operator, not a dump.
  *
  * Usage: tools/run_main.sh graft.tools.SimHashProbe <dir> ...
  */
object SimHashProbe {

  import ProbeTiming.time

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/scaledata/sf1r")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"[simhprobe] ${"dir"}%-30s ${"docs"}%9s ${"blocks"}%6s ${"sec"}%8s ${"n_pairs"}%12s ${"sum_hamming"}%12s")
    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      val blocks = Dedup.adaptiveSimHashBlocks(n, maxHamming = 6)
      val (row, sec) = time {
        // blocks passed explicitly: the adaptive default would re-count
        // the corpus inside the timed region (identical result — the
        // knob is a pure function of n)
        Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 6, blocks = blocks)
          .agg(count(lit(1)).as("n_pairs"), sum(col("hamming")).as("sum_hamming"))
          .head()
      }
      val nPairs = row.getLong(0)
      val sumH = if (row.isNullAt(1)) 0L else row.getLong(1)
      println(f"[simhprobe] $dir%-30s $n%9d $blocks%6d $sec%8.2f $nPairs%12d $sumH%12d")
    }
    spark.stop()
  }
}
