package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the bench corpus (VERDICT r3 #8: turn
  * the "survives 100×" plan arguments into a measured data point).
  * Replicates every sf0.1 table `rep` times with disjoint key spaces so
  * the result behaves like a genuinely larger corpus, not `rep` copies
  * of the same one:
  *
  *  - join keys (cust/order/part/supp, event user/id, doc/vec ids) are
  *    offset by `replica · 10^7` per replica — join fan-out and
  *    group-by cardinalities scale linearly, exactly like real growth;
  *  - document TOKENS get a per-replica suffix (`_rN`), making replica
  *    vocabularies disjoint: near-dup pair counts, line-dedup
  *    survivors and TF-IDF vocab scale LINEARLY (bare replication
  *    would make every doc a 10-way exact dup and near-dup outputs
  *    quadratic — a different, degenerate workload);
  *  - embeddings are perturbed with a deterministic hash-derived
  *    epsilon per (vec_id, replica, component), so replicas are not
  *    exact clones of the original vectors (top-k would otherwise fill
  *    with ties);
  *  - events keep their timestamps (same window, 10× the users — the
  *    realistic shape for a fixed collection period); `ts` passes
  *    through in whatever encoding the source carries (timestamp[us]
  *    NTZ for driver testdata, long nanos when chaining from a
  *    fix_scaleup_events output — QueryCatalog.eventsMicros handles
  *    both), and tools/fix_scaleup_events.py rewrites the result to
  *    timestamp[ns] so DuckDB binds a timestamp for the oracles.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <outDir> <replicas> [keyStride] [fileScale]
  *
  * `keyStride` (default 10^7) must exceed the source's max key. When
  * CHAINING scale-ups (sf0.1 → sf1 → sf10) pass a larger stride for
  * the second hop — sf1 ids already occupy [0, 9·10^7 + max), so the
  * default stride would collide replica key ranges; 10^9 keeps them
  * disjoint. Token suffixes compose per hop ("vector" → "vectorqb" →
  * "vectorqbqc"), so chained replica vocabularies stay disjoint too.
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val rep = args(2).toInt
    val Stride = if (args.length > 3) args(3).toLong else 10_000_000L
    // Output-file multiplier: the per-table file counts below are sized
    // for the sf0.1→sf1 hop; a deeper hop (sf10→sf100 writes ~20 GB)
    // with the same counts would emit >1 GB files from 16 write tasks.
    // Scaling the counts keeps files in the healthy 100–200 MB band and
    // the write as parallel as the corpus is large.
    val fileScale = if (args.length > 4) args(4).toInt else 1
    require(rep <= 26, "suffix alphabet covers at most 26 replicas")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String, files: Int): Unit =
      df.repartition(files * fileScale).write.mode("overwrite").parquet(s"$out/$name.parquet")

    // replica index joined in as a tiny broadcast range — one scan of
    // the source per table, `rep` output rows per input row
    val reps = spark.range(rep).toDF("__rep")
    def blow(df: DataFrame): DataFrame = df.crossJoin(broadcast(reps))
    def off(c: String) = col(c) + col("__rep") * Stride

    // fixed dims: copy untouched (joins against them stay broadcastable)
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    write(
      blow(read("customer")).withColumn("c_custkey", off("c_custkey")).drop("__rep"),
      "customer", 4)
    write(
      blow(read("supplier")).withColumn("s_suppkey", off("s_suppkey")).drop("__rep"),
      "supplier", 1)
    write(
      blow(read("part")).withColumn("p_partkey", off("p_partkey")).drop("__rep"),
      "part", 4)
    write(
      blow(read("orders"))
        .withColumn("o_orderkey", off("o_orderkey"))
        .withColumn("o_custkey", off("o_custkey"))
        .drop("__rep"),
      "orders", 8)
    write(
      blow(read("lineitem"))
        .withColumn("l_orderkey", off("l_orderkey"))
        .withColumn("l_partkey", off("l_partkey"))
        .withColumn("l_suppkey", off("l_suppkey"))
        .drop("__rep"),
      "lineitem", 16)
    write(
      blow(read("events"))
        .withColumn("event_id", off("event_id"))
        .withColumn("user_id", off("user_id"))
        .drop("__rep"),
      "events", 8)
    write(
      blow(read("documents"))
        .withColumn("doc_id", off("doc_id"))
        .withColumn(
          "text",
          // Letters-only lowercase suffix ("vector" -> "vectorqb" in
          // replica 1): keeps replica vocabularies disjoint while
          // staying INERT through the cleaning battery. The earlier
          // "_rN" scheme was not: C2 spaces the underscore out and the
          // C3 letter-digit stage then eats the bare "rN" token, so
          // clean-path oracles (whose RE2 chain cannot express C3's
          // Hangul lookarounds) diverged from Spark at sf1.
          when(col("__rep") === 0, col("text"))
            .otherwise(regexp_replace(
              col("text"),
              lit("(\\S+)"),
              concat(lit("$1q"), expr("substr('abcdefghijklmnopqrstuvwxyz', cast(__rep AS INT) + 1, 1)"))))
        )
        .withColumn("n_chars", length(col("text")).cast("long"))
        .drop("__rep"),
      "documents", 8)
    write(
      blow(read("embeddings"))
        .withColumn("vec_id", off("vec_id"))
        .withColumn(
          "embedding",
          when(col("__rep") === 0, col("embedding")).otherwise(
            transform(
              col("embedding"),
              (x, i) =>
                (x + (pmod(xxhash64(col("vec_id"), col("__rep"), i), lit(1000)).cast("double") / 1000.0 - 0.5) * 0.05)
                  .cast("float")
            )
          )
        )
        .drop("__rep"),
      "embeddings", 2)

    println(s"[scaleup] wrote ${rep}x of $src to $out")
    spark.stop()
  }
}
