package graft.tools

import graft.dedup.SemanticDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the SemDeDup production path: does k ∝ n really
  * hold the within-cluster candidate-pair volume LINEAR in n?
  *
  * For each corpus decade, runs k-means assignment with k = n/TARGET
  * (TARGET = expected cluster population) and reports Σ s_c·(s_c−1)/2
  * — the exact pair count the dominance join enumerates — plus the
  * wall time of the full semanticDedupAuto. A fixed k would show the
  * pair column growing ∝ n²/k; the adaptive k should show ∝ n·TARGET.
  *
  * Usage: sbt "runMain graft.tools.SemDedupProbe <dir1> <dir2> ..."
  */
object SemDedupProbe {
  private val Target = 256 // expected cluster population

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/scaledata/sf1", "/root/repo/scaledata/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"[semprobe] ${"dir"}%-28s ${"n"}%10s ${"k"}%6s ${"pairs"}%14s ${"pairs/n"}%9s ${"survivors"}%10s ${"sec"}%7s")
    dirs.foreach { dir =>
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = e.count()
      val k = math.max(4, (n / Target).toInt)
      // pair volume over the buckets the dedup join actually uses
      val labeled =
        if (k > 256) {
          val model = graft.search.HierarchicalKMeans.train(e, "embedding", k)
          graft.search.HierarchicalKMeans.assign(e, "embedding", model)
        } else {
          val cfg = graft.model.IndexConfig.default.copy(nlist = k)
          graft.search.IvfIndex.build(e, "embedding", cfg)._1
            .withColumnRenamed("cluster_id", "cluster")
        }
      val pairs = labeled.groupBy("cluster").count()
        .agg(sum(col("count") * (col("count") - 1) / 2)).head().getDouble(0)
      val t0 = System.nanoTime()
      val survivors = SemanticDedup
        .semanticDedupAuto(e, "vec_id", "embedding", k, tau = 0.95)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[semprobe] $dir%-28s $n%10d $k%6d ${pairs.toLong}%14d ${pairs / n}%9.1f $survivors%10d $sec%7.2f")
    }
    spark.stop()
  }
}
