package graft.quality

import graft.model.QualityGates
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality/distribution aggregations (reference quality_monitor.py,
  * SURVEY.md §2.5 G3-G11). All single-pass groupBy/agg plans with
  * map-side partial aggregation; stddev is POPULATION std for numpy
  * ddof=0 parity (SURVEY.md §7.5 item 7).
  */
object QualityMonitor {

  /** G3 — chunk-size distribution (quality_monitor.py:25-47). */
  def sizeDistribution(df: DataFrame, charsCol: String, tokensCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("total_chunks"),
      min(col(charsCol)).as("min_chars"),
      max(col(charsCol)).as("max_chars"),
      round(avg(col(charsCol)), 4).as("avg_chars"),
      round(expr(s"percentile($charsCol, 0.5)"), 4).as("median_chars"),
      round(stddev_pop(col(charsCol)), 4).as("std_chars"),
      min(col(tokensCol)).as("min_tokens"),
      max(col(tokensCol)).as("max_tokens"),
      round(avg(col(tokensCol)), 4).as("avg_tokens"),
      round(expr(s"percentile($tokensCol, 0.5)"), 4).as("median_tokens")
    )

  /** G4 — fixed-width histogram of a numeric column (30 bins by
    * default, quality_monitor.py:49-77). min/max resolved in the same
    * job via window-free double aggregation: first pass agg is fine at
    * any scale (2 jobs total).
    */
  def histogram(df: DataFrame, valueCol: String, bins: Int = 30): DataFrame = {
    val Row2 = df.agg(min(col(valueCol)).cast("double"), max(col(valueCol)).cast("double")).head()
    val (lo, hi) = (Row2.getDouble(0), Row2.getDouble(1))
    val width = if (hi > lo) (hi - lo) / bins else 1.0
    df.withColumn(
      "bin",
      least(floor((col(valueCol).cast("double") - lit(lo)) / lit(width)), lit(bins - 1)).cast("int")
    ).groupBy("bin")
      .count()
      .orderBy("bin")
  }

  /** G5 — language distribution, most-common-first (quality_monitor.py:86-90). */
  def languageDistribution(df: DataFrame, langCol: String): DataFrame = {
    // group counts first, then join the (tiny) per-language counts to
    // their one-row grand total for percentages — a broadcast
    // nested-loop join of #languages × 1 rows, instead of an
    // unpartitioned window (which plans a single-partition WindowExec
    // and logs a scary everything-to-one-task warning even though the
    // input here is already aggregated)
    val counts = df.groupBy(col(langCol)).count()
    val total = counts.agg(sum(col("count")).as("__total"))
    counts
      .crossJoin(broadcast(total))
      .withColumn("pct", round(col("count") * 100.0 / col("__total"), 4))
      .drop("__total")
      .orderBy(desc("count"), col(langCol))
  }

  /** G6 — top-N source files by chunk count (quality_monitor.py:93-98).
    * Deterministic tiebreak on the name.
    */
  def topSources(df: DataFrame, fileCol: String, n: Int = 10): DataFrame =
    df.groupBy(col(fileCol)).count().orderBy(desc("count"), col(fileCol)).limit(n)

  /** G7 — fraction of chunks whose token count is in the target range
    * (quality_monitor.py:176-180).
    */
  def inRangeRatio(tokensCol: Column, lo: Int = QualityGates.TokenRangeLo, hi: Int = QualityGates.TokenRangeHi): Column =
    avg(when(tokensCol.between(lo, hi), 1.0).otherwise(0.0))

  /** G8 — coefficient of variation, population std (quality_monitor.py:183-184). */
  def coefficientOfVariation(c: Column): Column =
    stddev_pop(c) / avg(c) * 100.0

  /** G10 — quality report row with threshold recommendations
    * (quality_monitor.py:160-215): warn when in-range < 70% or CV > 50%.
    */
  def report(df: DataFrame, tokensCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("total_chunks"),
      round(inRangeRatio(col(tokensCol)) * 100.0, 4).as("in_range_pct"),
      round(coefficientOfVariation(col(tokensCol)), 4).as("cv_pct"),
      round(avg(col(tokensCol)), 4).as("avg_tokens"),
      round(stddev_pop(col(tokensCol)), 4).as("std_tokens")
    ).withColumn(
      "recommendation",
      when(col("in_range_pct") < QualityGates.MinInRangeRatio * 100, lit("adjust_chunk_size"))
        .when(col("cv_pct") > QualityGates.MaxCoefficientOfVariation, lit("high_variance"))
        .otherwise(lit("ok"))
    )

  /** G10's serialization half — the reference dumps the validation
    * report as JSON (main.py:209-211; the DAG pushes the same dict to
    * XCom). `to_json(struct(*))` keeps the serialization in the plan
    * (codegen'd, no driver-side formatting), one JSON document per
    * report row.
    */
  def reportJson(df: DataFrame, tokensCol: String): DataFrame =
    report(df, tokensCol)
      .select(
        // json.dump always emits every key (null metrics on an empty
        // corpus included) — consumers key on field presence
        to_json(struct(col("*")), Map("ignoreNullFields" -> "false"))
          .as("report_json"))

  /** G9 — seeded random sample of n rows for review (quality_monitor.py:143-158). */
  def sampleReview(df: DataFrame, n: Int, seed: Long = 42L): DataFrame =
    df.orderBy(rand(seed)).limit(n)

  /** G9, reproducible form: top-n by md5 of the id — the engine's
    * deterministic analog of the reference's seeded `random.sample`.
    * `rand(seed)` is seed-deterministic only for a FIXED partition
    * layout (each task reseeds from the partition index), so the
    * sampled set silently changes with cluster size or AQE coalescing;
    * the md5 order is a pure function of the data, identical on any
    * engine — which is what lets the driver's DuckDB oracle replay the
    * sample exactly, and what lets a reviewer re-pull the same sample
    * months later. Plan shape: TakeOrderedAndProject (per-partition
    * heaps of n, driver merge) — no global sort.
    */
  def sampleReviewByHash(df: DataFrame, idCol: String, n: Int): DataFrame =
    df.orderBy(md5(col(idCol).cast("string")), col(idCol)).limit(n)
}
