package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fourth-decade engine probe for UNCAPPED near-dup clustering
  * (VERDICT r14 #6): the graded q_dedup_clusters row answers
  * correctness on a fixed-density replica-0 slice (its oracle is a
  * deliberately exhaustive all-pairs Jaccard + recursive closure), so
  * nothing records the FULL-corpus clustering cost at 5M documents.
  * This probe runs the same composition uncapped — minHashLshPairs
  * over every document, then star-contraction connected components —
  * and reports rounds-to-convergence alongside wall-clock, splitting
  * the pair-generation cost (signatures + banding + verify) from the
  * contraction loop so the O(log n) claim is measured on the
  * contraction itself.
  *
  * Usage: tools/run_main.sh graft.tools.ClustersProbe <dir> ...
  */
object ClustersProbe {

  import ProbeTiming.time

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/scaledata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"[clustprobe] ${"dir"}%-30s ${"docs"}%9s ${"pairs"}%9s ${"pairs_s"}%8s ${"rounds"}%6s ${"clust_s"}%8s ${"labeled"}%9s ${"clusters"}%9s")
    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      // materialize the pair list first so the contraction loop's
      // timing is the contraction, not a re-run of the LSH each round
      val pairs = Dedup.minHashLshPairs(
        docs, "doc_id", "text",
        shingleSize = 3, numHashes = 32, bands = 8, jaccardThreshold = 0.8)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val (nPairs, pairSec) = time(pairs.count())
      val ((labeled, rounds), clustSec) = time {
        val (df, r) = Dedup.nearDupClustersWithRounds(pairs)
        val cached = df.persist(StorageLevel.MEMORY_AND_DISK)
        cached.count()
        (cached, r)
      }
      val nLabeled = labeled.count()
      val nClusters = labeled.select("cluster_id").distinct().count()
      println(f"[clustprobe] $dir%-30s $n%9d $nPairs%9d $pairSec%8.2f $rounds%6d $clustSec%8.2f $nLabeled%9d $nClusters%9d")
      labeled.unpersist()
      pairs.unpersist()
    }
    spark.stop()
  }
}
