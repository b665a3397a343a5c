package graft.tools

import graft.streaming.StreamingNearDup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for q_stream_neardup (the catalog's slowest row):
  * how much of the batch execution is (a) minhash signatures +
  * banding, (b) the typed groupByKey exchange + sort, (c) the
  * flatMapGroupsWithState machine itself.
  *
  * Usage: tools/run_main.sh graft.tools.StreamNearDupProbe <dir> ...
  */
object StreamNearDupProbe {

  import ProbeTiming.time

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/scaledata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"[sndprobe] ${"dir"}%-28s ${"docs"}%8s ${"obs"}%9s ${"sig_s"}%7s ${"state_s"}%8s ${"full_s"}%7s ${"hits"}%7s")
    dirs.foreach { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val n = docs.count()
      // (a) signatures + banding alone (count forces the whole projection)
      val obs = StreamingNearDup.bandObservations(docs, "doc_id", "text")
      val (nObs, sigSec) = time(obs.count())
      // (b+c) state machine over PRE-MATERIALIZED observations: isolate
      // the exchange+sort+state cost from the signature scan
      val cached = obs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached.count()
      val (nHits, stateSec) = time(
        StreamingNearDup.nearDupHits(cached).dropDuplicates("id", "dup_of").count())
      cached.unpersist()
      // (a+b+c) the graded row's full shape
      val (_, fullSec) = time(
        StreamingNearDup.detect(docs, "doc_id", "text")
          .dropDuplicates("id", "dup_of").count())
      println(f"[sndprobe] $dir%-28s $n%8d $nObs%9d $sigSec%7.2f $stateSec%8.2f $fullSec%7.2f $nHits%7d")
    }
    spark.stop()
  }
}
