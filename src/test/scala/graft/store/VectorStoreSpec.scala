package graft.store

import graft.SparkTestBase
import graft.model.IndexConfig
import graft.search.IvfIndex
import org.apache.spark.sql.functions._
import java.nio.file.Files

class VectorStoreSpec extends SparkTestBase {

  test("partitioned write routes folders to collections; read prunes partitions (G1/O3)") {
    import spark.implicits._
    val store = new VectorStore(Files.createTempDirectory("graft-store").toString)
    val df = Seq(
      ("a", "Folder One", "text a"),
      ("b", "Folder One", "text b"),
      ("c", "other-folder", "text c")
    ).toDF("id", "folder", "text")
    store.writePartitioned(df, "folder", "docs_")

    val all = store.readAll(spark)
    assert(all.count() == 3)
    val stats = store.stats(spark).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("docs_folder_one" -> 2L, "docs_other_folder" -> 1L))

    // partition pruning visible in the plan
    val one = all.filter(col("collection") === "docs_folder_one")
    val plan = one.queryExecution.executedPlan.toString
    assert(one.count() == 2)
    assert(!plan.contains("Exchange"), "collection filter must not shuffle")
  }

  test("IVF labeled store: cluster filter prunes partitions; stored search == in-memory search") {
    val store = new VectorStore(Files.createTempDirectory("graft-ivf").toString)
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val cfg = IndexConfig(nlist = 8, nprobe = 3)
    val (labeled, centroids) = IvfIndex.build(e, "embedding", cfg)
    store.writeIndexed(labeled, "vectors")

    val stored = store.readCollection(spark, "vectors")
    val q = e.filter(col("vec_id") === 5).head().getSeq[Float](1).toArray

    val fromStore = IvfIndex.searchTopK(stored, centroids, q, 5, cfg)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val fromMem = IvfIndex.searchTopK(labeled, centroids, q, 5, cfg)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(fromStore == fromMem)

    // the cluster_id isin filter reaches the scan as a partition filter
    val probes = IvfIndex.nearestClusters(q, centroids, cfg.nprobe)
    val pruned = stored.filter(col("cluster_id").isin(probes: _*))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("cluster_id"), s"expected partition pruning:\n$scan")
  }

  test("drop collection / drop all (S11)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-drop").toString
    val store = new VectorStore(root)
    store.writeCollection(Seq((1, "x")).toDF("id", "t"), "c1")
    assert(spark.read.parquet(s"$root/c1").count() == 1)
    store.dropCollection("c1")
    assert(!new java.io.File(s"$root/c1").exists())
  }

  test("bucketed tables join without shuffle or sort (co-located layout)") {
    import spark.implicits._
    val store = new VectorStore(java.nio.file.Files.createTempDirectory("graft-bt").toString)
    val chunks = (1 to 1000).map(i => (s"chunk$i", s"text $i")).toDF("chunk_id", "text")
    val meta = (1 to 1000).map(i => (s"chunk$i", i % 7)).toDF("chunk_id", "quality")
    store.writeBucketedTable(chunks, "bt_chunks", "chunk_id", 8)
    store.writeBucketedTable(meta, "bt_meta", "chunk_id", 8)
    // force the merge-join path (tiny test tables would otherwise be
    // broadcast, which sidesteps bucketing entirely)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bt_chunks").join(spark.table("bt_meta"), "chunk_id")
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must use buckets:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bt_chunks")
      spark.sql("DROP TABLE IF EXISTS bt_meta")
    }
  }
}
