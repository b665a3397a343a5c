package graft.tools

import graft.model.IndexConfig
import graft.search.IvfIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the large-nlist IVF build: flat MLlib Lloyd (n·k distance
  * work per iteration) vs the hierarchical route IvfIndex.build now
  * takes above HierarchicalNlistThreshold (n·√k) — the same bottleneck
  * the SemDeDup ladder measured at 77.9 vs 22.7 s for k=781 at 200k
  * vectors (SCALE.md round-12), here measured on IvfIndex's own entry
  * point. Also reports a search-quality anchor: recall@10 of the
  * radius-bounded exact search on each index (must be 10/10 on BOTH —
  * the bound is partition-agnostic).
  *
  * Usage: tools/run_main.sh graft.tools.IvfBuildProbe <dir> [nlist...]
  */
object IvfBuildProbe {

  import ProbeTiming.time

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/scaledata/sf1"
    val nlists = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1024)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    implicit val s: SparkSession = spark
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val n = e.count()
    val q = e.filter(col("vec_id") === 7).head().getSeq[Float](1).toArray
    val exact = graft.search.VectorSearch.topK(e, q, 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet

    println(f"[ivfbuild] n=$n%d dir=$dir")
    println(f"[ivfbuild] ${"nlist"}%6s ${"path"}%6s ${"k"}%6s ${"build_s"}%8s ${"recall@10"}%9s")
    nlists.foreach { nlist =>
      // flat reference: force the MLlib path regardless of threshold by
      // calling the public API below the threshold shape — we re-run the
      // flat branch via a config object and a direct KMeans-path call
      val ((flatLabeled, flatCents), flatSec) = time {
        FlatForProbe.build(e, "embedding", IndexConfig(nlist = nlist))
      }
      val flatRecall = recallOf(flatLabeled, flatCents, q, exact)
      println(f"[ivfbuild] $nlist%6d ${"flat"}%6s ${flatCents.length}%6d $flatSec%8.1f $flatRecall%9s")

      val ((hierLabeled, hierCents), hierSec) = time {
        IvfIndex.build(e, "embedding", IndexConfig(nlist = nlist))
      }
      val hierRecall = recallOf(hierLabeled, hierCents, q, exact)
      println(f"[ivfbuild] $nlist%6d ${"hier"}%6s ${hierCents.length}%6d $hierSec%8.1f $hierRecall%9s")
    }
    spark.stop()
  }

  private def recallOf(
      labeled: org.apache.spark.sql.DataFrame,
      cents: Array[Array[Float]],
      q: Array[Float],
      exact: Set[Long]
  )(implicit spark: SparkSession): String = {
    val l = labeled.cache()
    try {
      val radii = IvfIndex.clusterRadii(l, cents)
      val got = IvfIndex.searchTopKExact(l, cents, radii, q, 10, scout = 16)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      s"${exact.intersect(got).size}/10"
    } finally l.unpersist()
  }
}

/** The flat MLlib branch extracted verbatim so the probe can run it at
  * any nlist (IvfIndex.build itself reroutes above the threshold).
  */
private object FlatForProbe {
  import org.apache.spark.ml.clustering.KMeans
  import org.apache.spark.ml.functions.array_to_vector
  import org.apache.spark.sql.DataFrame

  def build(corpus: DataFrame, vecCol: String, cfg: IndexConfig, seed: Long = 42L)
      : (DataFrame, Array[Array[Float]]) = {
    val withVec = corpus.withColumn("__v", array_to_vector(col(vecCol).cast("array<double>")))
    val target = 256 * cfg.nlist
    val n = corpus.count()
    val fitSet =
      if (n > target) withVec.sample(withReplacement = false, target.toDouble / n, seed)
      else withVec
    val km = new KMeans().setK(cfg.nlist).setSeed(seed)
      .setFeaturesCol("__v").setPredictionCol("cluster_id").setMaxIter(10)
    val model = km.fit(fitSet)
    (model.transform(withVec).drop("__v"), model.clusterCenters.map(_.toArray.map(_.toFloat)))
  }
}
