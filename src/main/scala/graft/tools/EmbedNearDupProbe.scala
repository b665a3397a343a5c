package graft.tools

import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fourth-decade engine probe for the ADAPTIVE embedding near-dup
  * (VERDICT r14 #1): the graded q_embed_neardup_adaptive row is an
  * O(1) certificate (count + checksums over every pair), answer-checked
  * at sf100 on the plain fixture — this probe records the operator's
  * wall-clock decade curve on the REALISTIC-duplication fixtures
  * (ScaleUp dupRatePct < 100), where only the kept fraction of vectors
  * stays inside the near-dup band and the rest carry order-of-magnitude
  * noise, i.e. the mostly-unique corpus the adaptive blocking was
  * designed for. Sinks to the same certificate aggregate the graded row
  * uses, so the measured cost is candidate formation + verify, never a
  * pair dump.
  *
  * Usage: tools/run_main.sh graft.tools.EmbedNearDupProbe <dir> ...
  */
object EmbedNearDupProbe {

  import ProbeTiming.time

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/scaledata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // GRAFT_EMB_BANDED=1 probes the banded (multi-probe) variant with
    // its defaults instead of the adaptive single-band path
    val banded = sys.env.get("GRAFT_EMB_BANDED").contains("1")
    println(f"[embprobe] ${"dir"}%-30s ${"route"}%8s ${"vecs"}%9s ${"sec"}%8s ${"n_pairs"}%12s ${"sum_cos4"}%14s")
    dirs.foreach { dir =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val (row, sec) = time {
        val pairs =
          if (banded) Dedup.embeddingNearDupPairsBanded(emb, "vec_id", "embedding", 0.3)
          else Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.3)
        pairs
          .agg(
            count(lit(1)).as("n_pairs"),
            sum(round(col("cosine") * 10000, 0).cast("long")).as("sum_cos4"))
          .head()
      }
      val nPairs = row.getLong(0)
      val sumCos = if (row.isNullAt(1)) 0L else row.getLong(1)
      val route = if (banded) "banded" else "adaptive"
      println(f"[embprobe] $dir%-30s $route%8s $n%9d $sec%8.2f $nPairs%12d $sumCos%14d")
    }
    spark.stop()
  }
}
