package graft.dedup

import graft.SparkTestBase
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class SemanticDedupSpec extends SparkTestBase {

  private def vecsOf(n: Int, dim: Int = 8): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val rnd = new scala.util.Random(1000 + i)
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))
    }

  test("assignClusters matches brute-force nearest pivot and is shuffle-free") {
    import spark.implicits._
    val rows = vecsOf(60)
    val df = rows.toDF("vec_id", "embedding")
    val pivots = rows.take(4).map(_._2)
    val got = SemanticDedup.assignClusters(df, "embedding", pivots)
    // shuffle-free: assignment must not introduce an Exchange
    assert(!got.queryExecution.executedPlan.toString.contains("Exchange"),
      "pivot assignment must be a map-only projection")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val expect = rows.map { case (id, v) =>
      id -> pivots.zipWithIndex.maxBy { case (p, i) => (cos(v, p), -i) }._2
    }.toMap
    got.select("vec_id", "cluster").collect().foreach { r =>
      assert(r.getInt(1) == expect(r.getLong(0)), s"vec ${r.getLong(0)}")
    }
  }

  test("semanticDedup drops exactly the dominated rows and keeps cluster labels") {
    import spark.implicits._
    // two tight direction-clusters plus noise: same-direction scaled
    // copies are mutual near-dups (cos=1); only the lowest id survives
    val base = vecsOf(20)
    val dupA = (100L, base(3)._2.map(_ * 2.0f))
    val dupB = (101L, base(3)._2.map(_ * 0.5f))
    val dupC = (102L, base(7)._2.map(_ * 3.0f))
    val df = (base ++ Seq(dupA, dupB, dupC)).toDF("vec_id", "embedding")
    val pivots = base.take(4).map(_._2)
    val out = SemanticDedup.semanticDedup(df, "vec_id", "embedding", pivots, tau = 0.999)
    val kept = out.select("vec_id").as[Long].collect().toSet
    assert(!kept.contains(100L) && !kept.contains(101L) && !kept.contains(102L))
    assert(kept.contains(3L) && kept.contains(7L))
    assert(out.columns.contains("cluster"))
    // at tau above any non-identical cosine, everything else survives
    assert(kept.size == 20)
  }

  test("semanticDedupAuto removes scaled duplicates and is seed-deterministic") {
    import spark.implicits._
    val base = vecsOf(40)
    val dups = Seq((200L, base(5)._2.map(_ * 2f)), (201L, base(11)._2.map(_ * 4f)))
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val out1 = SemanticDedup.semanticDedupAuto(df, "vec_id", "embedding", k = 4, tau = 0.999)
      .select("vec_id").as[Long].collect().toSet
    val out2 = SemanticDedup.semanticDedupAuto(df, "vec_id", "embedding", k = 4, tau = 0.999)
      .select("vec_id").as[Long].collect().toSet
    assert(out1 == out2, "same seed must give the same survivors")
    assert(!out1.contains(200L) && !out1.contains(201L))
    assert(out1.contains(5L) && out1.contains(11L))
  }

  test("lloydStep: populations sum to n, centroids are per-cluster means, step tightens") {
    import spark.implicits._
    val rows = vecsOf(80)
    val df = rows.toDF("vec_id", "embedding")
    val pivots = rows.take(4).map(_._2)
    val step = SemanticDedup.lloydStep(df, "embedding", pivots).collect()
    assert(step.map(_.getAs[Long]("n")).sum == 80L)
    // recompute one cluster's mean by hand
    val asg = SemanticDedup.assignClusters(df, "embedding", pivots)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val c0 = rows.filter { case (id, _) => asg(id) == 0 }
    val d0mean = c0.map(_._2(0).toDouble).sum / c0.size
    val got = step.find(_.getAs[Int]("cluster") == 0).get
      .getAs[Seq[Double]]("__m").head
    assert(math.abs(got - d0mean) < 1e-9, s"$got vs $d0mean")
    // a Lloyd step cannot loosen: mean cosine to UPDATED centroids
    // (next assignment round) >= mean cosine to the old pivots
    val updated = step.sortBy(_.getAs[Int]("cluster"))
      .map(_.getAs[Seq[Double]]("__m").map(_.toFloat).toArray)
    val before = step.map(r => r.getAs[Double]("__mc") * r.getAs[Long]("n")).sum / 80.0
    val asg2 = SemanticDedup.assignClusters(df, "embedding", updated.toSeq)
    val pivMat = array(updated.map(p => typedLit(p.toSeq)): _*)
    val after = asg2
      .select(avg(VectorFunctions.cosineSimilarity(col("embedding"),
        element_at(pivMat, col("cluster") + 1))))
      .head().getDouble(0)
    assert(after >= before - 1e-12, s"step must not loosen: $after < $before")
  }
}
