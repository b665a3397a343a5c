package graft.tools

import graft.functions.VectorFunctions._
import graft.search.ProductQuant
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off parameter probe for PQ recall@10: overlap of
  * ADC-shortlist-then-rerank vs exact top-10, across (m, ksub,
  * shortlist) combos. Usage: runMain graft.tools.PqProbe <sfDir...>
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = e.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray
      val exact = e
        .withColumn("score", round(cosineSimilarity(col("embedding"), typedLit(q.toSeq)), 4))
        .orderBy(desc("score"), col("vec_id"))
        .limit(10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      // the (m, ksub) frontier question was settled on small corpora;
      // fitting 6 combos over millions of vectors answers nothing new
      val comboCombos =
        if (e.count() <= 250000) Seq((8, 16), (8, 64), (8, 256), (16, 16), (16, 64), (16, 256))
        else Seq.empty
      for ((m, ksub) <- comboCombos) {
        // codebooks/codes are shortlist-independent — fit/encode once per combo
        val cbs = ProductQuant.fit(e, m = m, ksub = ksub)
        val enc = ProductQuant.encode(e, cbs).cache()
        for (shortlist <- Seq(50, 100)) {
          val pq = ProductQuant
            .adcTopK(enc, cbs, q, 10, shortlist = shortlist)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          println(s"[pqprobe] $dir m=$m ksub=$ksub shortlist=$shortlist overlap=${(pq intersect exact).size}/10")
        }
        enc.unpersist()
      }
      // Shortlist-vs-corpus-size sweep at the production (16, 256):
      // does a FIXED shortlist hold recall as n grows, and what
      // fraction of n does? Several query vectors — one query's
      // overlap is too noisy to set a default from.
      val cbs = ProductQuant.fit(e, m = 16, ksub = 256)
      val enc = ProductQuant.encode(e, cbs).cache()
      val n = enc.count()
      for (shortlist <- Seq(100, 250, 500, 1000, 2000)) {
        val overlaps = (0L to 4L).map { qid =>
          val qv = e.filter(col("vec_id") === qid).select("embedding").head().getSeq[Float](0).toArray
          val ex = e
            .withColumn("score", round(cosineSimilarity(col("embedding"), typedLit(qv.toSeq)), 4))
            .orderBy(desc("score"), col("vec_id"))
            .limit(10)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          val pq = ProductQuant
            .adcTopK(enc, cbs, qv, 10, shortlist = shortlist)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          (pq intersect ex).size
        }
        println(s"[pqprobe] $dir n=$n shortlist=$shortlist overlaps=${overlaps.mkString(",")} min=${overlaps.min}")
      }
      enc.unpersist()
    }
    spark.stop()
  }
}
