package graft.tools

import graft.queries.QueryCatalog
import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for named catalog queries — the
  * plan-review loop (pushdown / broadcast / shuffle audit).
  * Usage: runMain graft.tools.PlanDump <sfDir> <query...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else QueryCatalog.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      QueryCatalog.queries.get(n).foreach { fn =>
        println(s"\n===== $n =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"plan failed: ${e.getMessage}") }
      }
    }
    spark.stop()
  }
}
