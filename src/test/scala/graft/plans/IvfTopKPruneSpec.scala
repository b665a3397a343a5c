package graft.plans

import graft.SparkTestBase
import graft.model.IndexConfig
import graft.search.{IvfIndex, VectorSearch}
import graft.store.VectorStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IvfTopKPruneSpec extends SparkTestBase {

  private def setup() = {
    val root = Files.createTempDirectory("graft-rule").toString
    val store = new VectorStore(root)
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val cfg = IndexConfig(nlist = 8, nprobe = 3)
    val (labeled, centroids) = IvfIndex.build(e, "embedding", cfg)
    store.writeIndexed(labeled, "vectors")
    (s"$root/vectors", centroids, cfg, e)
  }

  test("registered collection: naive topK is rewritten to probe nprobe clusters") {
    val (path, centroids, cfg, e) = setup()
    IvfCatalog.register(path, centroids, cfg.nprobe)
    IvfPruning.enable(spark)
    try {
      val q = e.filter(col("vec_id") === 3).head().getSeq[Float](1).toArray
      val naive = VectorSearch.topK(spark.read.parquet(path), q, 10)
      val physical = naive.queryExecution.executedPlan.toString
      assert(physical.contains("cluster_id"), s"expected cluster filter injected:\n$physical")

      // results equal the explicit IVF search path
      val stored = spark.read.parquet(path)
      val explicit = IvfIndex.searchTopK(stored, centroids, q, 10, cfg)
        .collect().map(_.getAs[Long]("vec_id")).toSet
      val viaRule = naive.collect().map(_.getAs[Long]("vec_id")).toSet
      assert(viaRule == explicit)
    } finally {
      IvfPruning.disable(spark)
      IvfCatalog.clear()
    }
  }

  test("unregistered collection: plan untouched, results exact") {
    val (path, centroids, cfg, e) = setup()
    IvfPruning.enable(spark)
    try {
      val q = e.filter(col("vec_id") === 3).head().getSeq[Float](1).toArray
      val naive = VectorSearch.topK(spark.read.parquet(path), q, 10)
      val optimized = naive.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("cluster_id IN"), s"must not prune unregistered:\n$optimized")
      val exact = VectorSearch.topK(e, q, 10).collect().map(_.getAs[Long]("vec_id")).toSet
      assert(naive.collect().map(_.getAs[Long]("vec_id")).toSet == exact)
    } finally {
      IvfPruning.disable(spark)
    }
  }

  test("explicit isin with >10 probes (InSet after OptimizeIn) is not double-filtered") {
    val root = Files.createTempDirectory("graft-rule-inset").toString
    val store = new VectorStore(root)
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val cfg = IndexConfig(nlist = 16, nprobe = 12) // 12 > inSetConversionThreshold (10)
    val (labeled, centroids) = IvfIndex.build(e, "embedding", cfg)
    store.writeIndexed(labeled, "vectors")
    val path = s"$root/vectors"
    IvfCatalog.register(path, centroids, cfg.nprobe)
    IvfPruning.enable(spark)
    try {
      val q = e.filter(col("vec_id") === 3).head().getSeq[Float](1).toArray
      val probes = IvfIndex.nearestClusters(q, centroids, cfg.nprobe)
      val explicit = VectorSearch.topK(
        spark.read.parquet(path).filter(col("cluster_id").isin(probes.map(Int.box): _*)), q, 10)
      val optimized = explicit.queryExecution.optimizedPlan
      val filters = optimized.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.references.exists(_.name == "cluster_id") => f
      }
      assert(filters.size == 1, s"rule re-fired on an already-probed (InSet) query:\n$optimized")
    } finally {
      IvfPruning.disable(spark)
      IvfCatalog.clear()
    }
  }

  test("rule is idempotent under the fixed-point batch (no filter stacking)") {
    val (path, centroids, cfg, e) = setup()
    IvfCatalog.register(path, centroids, cfg.nprobe)
    IvfPruning.enable(spark)
    try {
      val q = e.filter(col("vec_id") === 3).head().getSeq[Float](1).toArray
      val naive = VectorSearch.topK(spark.read.parquet(path), q, 10)
      val optimized = naive.queryExecution.optimizedPlan.toString
      val filters = "cluster_id".r.findAllIn(optimized).length
      // one filter reference expected (plus possible pushdown copy) — not one per iteration
      assert(filters <= 3, s"filter stacked $filters times:\n$optimized")
      naive.collect()
    } finally {
      IvfPruning.disable(spark)
      IvfCatalog.clear()
    }
  }
}
