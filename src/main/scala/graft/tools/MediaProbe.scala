package graft.tools
import graft.queries.QueryCatalog
import org.apache.spark.sql.SparkSession
object MediaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label%-20s ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    val qs = graft.SparkEntry.queries
    for (n <- Seq("q_image_features", "q_video_features", "q_media_features")) {
      (1 to 3).foreach { i => time(s"$n $i")(qs(n)(spark, dir).write.mode("overwrite").format("noop").save()) }
    }
    spark.stop()
  }
}
