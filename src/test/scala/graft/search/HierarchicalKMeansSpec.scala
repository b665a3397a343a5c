package graft.search

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HierarchicalKMeansSpec extends SparkTestBase {

  private def corpus(n: Int, dim: Int = 8) = {
    import spark.implicits._
    (0 until n).map { i =>
      val rnd = new scala.util.Random(500 + i)
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("train + assign: every row labeled, ids within cell*stride+sub bounds") {
    val df = corpus(300)
    val model = HierarchicalKMeans.train(df, "embedding", k = 16, iters = 3)
    assert(model.k >= 16 && model.cells.nonEmpty)
    val labeled = HierarchicalKMeans.assign(df, "embedding", model)
    assert(labeled.count() == 300)
    val ids = labeled.select("cluster").distinct().collect().map(_.getInt(0))
    val maxId = model.cells.size * model.stride - 1
    assert(ids.forall(c => c >= 0 && c <= maxId), s"out-of-range ids: ${ids.toSeq}")
    assert(ids.length > 4, "should use a meaningful number of clusters")
    // assignment is shuffle-free
    val plan = labeled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hierarchical assign must be map-only:\n$plan")
  }

  test("assignMulti: probes rows per input, primary bucket first equals assign") {
    val df = corpus(120)
    val model = HierarchicalKMeans.train(df, "embedding", k = 9, iters = 2)
    val multi = HierarchicalKMeans.assignMulti(df, "embedding", model, probes = 2)
    assert(multi.count() == 240)
    // the single assignment bucket is always among the probed buckets
    val primary = HierarchicalKMeans.assign(df, "embedding", model)
      .select(col("vec_id"), col("cluster").as("p"))
    val joined = multi.join(primary, "vec_id")
      .groupBy("vec_id").agg(max((col("cluster") === col("p")).cast("int")).as("hit"))
    assert(joined.filter(col("hit") === 0).count() == 0,
      "primary bucket must be one of the probes")
  }

  test("hierarchical semanticDedupAuto removes planted scaled duplicates") {
    import spark.implicits._
    val base = (0 until 200).map { i =>
      val rnd = new scala.util.Random(900 + i)
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat).toSeq)
    }
    val dups = Seq(
      (900L, base(17)._2.map(_ * 2f)), (901L, base(63)._2.map(_ * 3f)),
      (902L, base(110)._2.map(_ * 0.5f)))
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val out = graft.dedup.SemanticDedup
      .semanticDedupAuto(df, "vec_id", "embedding", k = 9, tau = 0.999,
        hierarchicalAbove = 4, probes = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(!out.contains(900L) && !out.contains(901L) && !out.contains(902L),
      "scaled duplicates must be removed on the hierarchical path")
    assert(out.contains(17L) && out.contains(63L) && out.contains(110L))
  }

  test("train rejects a double-typed vector column with an actionable error") {
    import org.apache.spark.sql.functions._
    val doubled = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val e = intercept[IllegalArgumentException] {
      HierarchicalKMeans.train(doubled, "embedding", k = 4)
    }
    assert(e.getMessage.contains("array<float>") && e.getMessage.contains("cast"))
  }
}
