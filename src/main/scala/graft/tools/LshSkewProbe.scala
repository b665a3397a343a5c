package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement probe behind the round-11 sf100 finding: the adaptive
  * sign-bit blocking key (Dedup.adaptiveSignBits sizes WIDTH from n
  * assuming uniform bucket occupancy) went 82× for 10× rows at sf100
  * (3.2 s → 263 s). Prints, for a given corpus and key width, the
  * sign-bucket population distribution (top buckets, Σ C(bucket, 2)
  * verify pairs vs the uniform-occupancy expectation) and the
  * per-component sign balance of the leading components — the two
  * candidate explanations (occupancy skew vs correlated components).
  *
  * Usage: runMain graft.tools.LshSkewProbe <sfDir> [bits]
  */
object LshSkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val bits = if (args.length > 1) args(1).toInt else -1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val b = if (bits > 0) bits else graft.dedup.Dedup.adaptiveSignBits(n)
    println(s"[probe] n=$n adaptive/chosen bits=$b (2^$b = ${1L << b} buckets)")

    // per-component sign balance for the first b components
    val fracs = emb.select(
      (0 until b).map(i =>
        avg(when(element_at(col("embedding"), i + 1) >= 0, 1.0).otherwise(0.0)).as(s"c$i")): _*
    ).head()
    println("[probe] P(component >= 0) for the first " + b + " components:")
    println("  " + (0 until b).map(i => f"c$i=${fracs.getDouble(i)}%.3f").mkString(" "))

    val keyed = emb.select(
      (0 until b)
        .map(i => when(element_at(col("embedding"), i + 1) >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << i))
        .reduce(_ + _).as("bkt"))
    val sizes = keyed.groupBy("bkt").count()
    val agg = sizes.agg(
      count(lit(1)).as("occupied"),
      max("count").as("maxBucket"),
      sum(col("count") * (col("count") - 1) / 2).as("verifyPairs")).head()
    val occupied = agg.getLong(0)
    val maxBucket = agg.getLong(1)
    val pairs = agg.getAs[Any](2).toString
    val uniformPairs = (1L << b).toDouble * {
      val e = n.toDouble / (1L << b); e * (e - 1) / 2
    }
    println(f"[probe] occupied buckets: $occupied of ${1L << b}; max bucket: $maxBucket")
    println(f"[probe] verify pairs: $pairs (uniform-occupancy expectation: ${uniformPairs}%.3g)")
    println("[probe] top 10 buckets:")
    sizes.orderBy(desc("count")).limit(10).collect()
      .foreach(r => println(f"  bkt=${r.getLong(0)}%6d count=${r.getLong(1)}"))
    spark.stop()
  }
}
