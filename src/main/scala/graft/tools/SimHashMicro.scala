package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway microbenchmark: signature computation only (no band join),
  * fast xxh64 vs portable md5 token hash, corpus inflated 20x.
  */
object SimHashMicro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
      .crossJoin(spark.range(20).toDF("rep"))
      .repartition(32)
      .cache()
    docs.count()
    def time(portable: Boolean): Double = {
      val t0 = System.nanoTime()
      docs.select(graft.dedup.Dedup.simHash(col("text"), portable).as("sig"))
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths, then 3 timed alternating runs each
    time(true); time(false)
    val md5 = (1 to 3).map(_ => time(true))
    val fast = (1 to 3).map(_ => time(false))
    println(f"[micro] md5=${md5.min}%.2f s  xxh64=${fast.min}%.2f s  speedup=${md5.min / fast.min}%.2fx (100k docs, sig only)")
    spark.stop()
  }
}
