package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing probe: runs named queries twice (warm) with
  * the noop sink. sbt "Test/runMain graft.QueryProbeMain q1,q2".
  */
object QueryProbeMain {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').toSeq).getOrElse(Seq("q_window_topn"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        graft.queries.QueryCatalog.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
