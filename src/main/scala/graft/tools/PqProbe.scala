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
      for ((m, ksub) <- Seq((8, 16), (8, 64), (8, 256), (16, 16), (16, 64), (16, 256))) {
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
    }
    spark.stop()
  }
}
