package graft.clean

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timing harness for the clean battery (see git history). */
object CleanBenchMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timeIt(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val noisy = concat(lit("<div class='x'> "), col("text"), lit(" tail"))
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    // warm codegen/janino
    timeIt("warm")(base.repartition(32).select(TextCleaner.cleanText(noisy).as("c")).write.mode("overwrite").format("noop").save())

    timeIt("repart32-clean-noop")(base.repartition(32).select(TextCleaner.cleanText(noisy).as("c")).write.mode("overwrite").format("noop").save())
    timeIt("noAQE") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      base.repartition(32).select(TextCleaner.cleanText(noisy).as("c")).write.mode("overwrite").format("noop").save()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    // how many tasks actually ran the project?
    val acc = spark.sparkContext.collectionAccumulator[Int]("pids")
    val pid = udf { () => acc.add(org.apache.spark.TaskContext.getPartitionId()); 1 }.asNondeterministic()
    base.repartition(32).select(TextCleaner.cleanText(noisy).as("c"), pid().as("p")).write.mode("overwrite").format("noop").save()
    println("distinct project partitions: " + acc.value.size)
    spark.stop()
  }
}
