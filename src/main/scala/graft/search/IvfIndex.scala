package graft.search

import graft.functions.VectorFunctions._
import graft.model.IndexConfig
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) vector index (reference S13/O5:
  * milvus_store.py:110-136, IVF_FLAT nlist=128 / nprobe=16). Spark-first
  * design: the "index" is (a) a small centroid table (driver/broadcast
  * scale: nlist × dim) and (b) a `cluster_id` column on the corpus,
  * written with `partitionBy("cluster_id")` so a search that probes
  * `nprobe` clusters reads only those partitions — ANN pruning becomes
  * partition pruning. HNSW is serving-infra shaped and intentionally
  * out of scope (SURVEY.md O5); exact search is the fallback.
  */
object IvfIndex {

  /** Train centroids with MLlib KMeans and label every row.
    * Returns (labeled corpus with `cluster_id`, centroid array).
    *
    * Training FITS on a bounded random sample (default 256·nlist rows,
    * the order Milvus/FAISS use for IVF training — Milvus trains on a
    * segment sample, not the collection) and TRANSFORMS the full
    * corpus. nlist centroids need thousands of points, not the corpus:
    * fitting on everything means ~maxIter full-corpus passes, the
    * expensive way to train 16–128 centroids at 100 TB. Corpora at or
    * below the sample target (every correctness-gate scale) fit on the
    * full data — behavior there is unchanged.
    */
  def build(
      corpus: DataFrame,
      vecCol: String = "embedding",
      cfg: IndexConfig = IndexConfig.default,
      seed: Long = 42L,
      fitSampleTarget: Int = 0 // ≤0 → 256 * cfg.nlist
  ): (DataFrame, Array[Array[Float]]) = {
    val withVec = corpus.withColumn("__v", array_to_vector(col(vecCol).cast("array<double>")))
    val target = if (fitSampleTarget > 0) fitSampleTarget else 256 * cfg.nlist
    val n = corpus.count() // column-pruned count, one cheap job at index-build time
    val fitSet =
      if (n > target) withVec.sample(withReplacement = false, target.toDouble / n, seed)
      else withVec
    val km = new KMeans()
      .setK(cfg.nlist)
      .setSeed(seed)
      .setFeaturesCol("__v")
      .setPredictionCol("cluster_id")
      .setMaxIter(10)
    val model = km.fit(fitSet)
    val labeled = model.transform(withVec).drop("__v")
    val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
    (labeled, centroids)
  }

  /** The nprobe nearest centroid ids for a query vector (driver-side —
    * centroids are tiny).
    */
  def nearestClusters(queryVec: Array[Float], centroids: Array[Array[Float]], nprobe: Int): Seq[Int] = {
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def norm(a: Array[Float]) = math.sqrt(dot(a, a))
    val qn = norm(queryVec)
    centroids.zipWithIndex
      .map { case (c, i) =>
        val d = norm(c) * qn
        (if (d == 0) -1.0 else dot(c, queryVec) / d, i)
      }
      .sortBy(-_._1)
      .take(nprobe)
      .map(_._2)
  }

  /** Q1 with IVF pruning: filter to the nprobe nearest clusters (an
    * `isin` filter that prunes partitions when the corpus is stored
    * partitioned by cluster_id), then exact top-k on the survivors.
    */
  def searchTopK(
      labeledCorpus: DataFrame,
      centroids: Array[Array[Float]],
      queryVec: Array[Float],
      k: Int,
      cfg: IndexConfig = IndexConfig.default,
      vecCol: String = "embedding",
      predicate: Option[Column] = None
  ): DataFrame = {
    val probes = nearestClusters(queryVec, centroids, cfg.nprobe)
    val pruned = labeledCorpus.filter(col("cluster_id").isin(probes: _*))
    VectorSearch.topK(pruned, queryVec, k, vecCol, predicate = predicate)
  }

  /** IVF-accelerated kNN JOIN: assign each query to its nprobe nearest
    * centroids (small broadcast join against the centroid table), then
    * equi-join queries to corpus on cluster_id — the cross product
    * never forms; shuffle is keyed by cluster. Final per-query top-k by
    * window.
    */
  def knnJoin(
      queries: DataFrame,
      labeledCorpus: DataFrame,
      centroids: Array[Array[Float]],
      queryIdCol: String,
      corpusIdCol: String,
      k: Int,
      nprobe: Int = IndexConfig.default.nprobe,
      queryVecCol: String = "embedding",
      corpusVecCol: String = "embedding",
      // Rank on scores rounded to this many decimals (with neighbor_id
      // tiebreak) — gives engine-independent, reproducible rankings when
      // raw cosines differ only past the rounding grid.
      scoreRounding: Option[Int] = None,
      // Drop corpus rows whose id equals the query id BEFORE ranking —
      // the usual self-match exclusion when querying a corpus with
      // itself (must happen pre-window or it eats a rank slot).
      excludeSelf: Boolean = false
  )(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val centDf = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toSeq
      .toDF("cluster_id", "centroid")

    val q = queries.select(col(queryIdCol).as("query_id"), col(queryVecCol).as("__qvec"))
    // query → nprobe candidate clusters (broadcast the tiny centroid table)
    val qClusters = q
      .crossJoin(broadcast(centDf))
      .withColumn("__csim", cosineSimilarity(col("__qvec"), col("centroid")))
      .withColumn(
        "__crank",
        row_number().over(Window.partitionBy("query_id").orderBy(desc("__csim"), col("cluster_id")))
      )
      .filter(col("__crank") <= nprobe)
      .select(col("query_id"), col("__qvec"), col("cluster_id"))

    val c = labeledCorpus.select(
      col("cluster_id"),
      col(corpusIdCol).as("neighbor_id"),
      col(corpusVecCol).as("__cvec")
    )
    val w = Window.partitionBy("query_id").orderBy(desc("score"), col("neighbor_id"))
    val joined = c.join(qClusters, Seq("cluster_id"))
    val nonSelf = if (excludeSelf) joined.filter(col("neighbor_id") =!= col("query_id")) else joined
    val scored = nonSelf
      .withColumn("score", cosineSimilarity(col("__cvec"), col("__qvec")))
    val graded = scoreRounding.fold(scored)(dp => scored.withColumn("score", round(col("score"), dp)))
    graded
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }
}
