package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe behind q_approx_distinct's sf10 cost (round 11: the
  * row went 2.5 s → 40.9 s on the sf1→sf10 hop, 16× for 10× rows).
  * Compares formulations of "exact distinct + HLL sketch over one
  * column":
  *   combined — one agg carrying countDistinct AND
  *              approx_count_distinct (Catalyst plans the mix via
  *              Expand: every input row is replicated per aggregate
  *              group before the partial agg)
  *   split    — two passes: distinct().count() and a pure-HLL agg
  *   grouped  — exact side as groupBy(key).count().count() (no
  *              Expand, no distinct-aggregate machinery)
  * Usage: runMain graft.tools.DistinctProbe <sfDir...>
  */
object DistinctProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    for (dir <- dirs) {
      val l = spark.read.parquet(s"$dir/lineitem.parquet").select("l_partkey")
      l.count() // warm the scan path
      val (r1, t1) = time {
        val row = l.agg(
          countDistinct(col("l_partkey")).as("exact"),
          approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx")).head()
        (row.getLong(0), row.getLong(1))
      }
      val (r2, t2) = time {
        val exact = l.distinct().count()
        val approx = l.agg(approx_count_distinct(col("l_partkey"), rsd = 0.02)).head().getLong(0)
        (exact, approx)
      }
      val (r3, t3) = time {
        val exact = l.groupBy("l_partkey").agg(count(lit(1))).count()
        val approx = l.agg(approx_count_distinct(col("l_partkey"), rsd = 0.02)).head().getLong(0)
        (exact, approx)
      }
      println(f"[distinctprobe] $dir combined=$t1%.2fs $r1 split=$t2%.2fs $r2 grouped=$t3%.2fs $r3")
    }
    spark.stop()
  }
}
