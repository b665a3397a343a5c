package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. First choice at scale is AQE
  * (spark.sql.adaptive.skewJoin.enabled splits oversized partitions at
  * runtime); these helpers cover the cases AQE can't touch — a
  * shuffle-hash/sort-merge join against a mid-sized dimension that is
  * too big to broadcast but has a handful of hot keys.
  */
object SkewTools {

  /** Salted equi-join: the skewed (large) side gets a random salt in
    * [0, factor); the dimension side is replicated `factor` times with
    * every salt value, so each hot key fans out over `factor` reduce
    * partitions. Semantics identical to `large.join(dim, keys)` for
    * inner/left joins on unique dim keys; cost = dim × factor.
    */
  def saltedJoin(
      large: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      factor: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = large.withColumn("__salt", (rand(42) * factor).cast("int"))
    val replicated = dim.withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    salted
      .join(replicated, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Two-phase aggregation with an explicit salt — for HOLISTIC
    * aggregates over skewed keys where map-side partial aggregation
    * can't shrink the hot key (e.g. collect_list/exact distinct).
    * `partial` runs per (key, salt), `merge` combines the per-salt
    * results per key.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      factor: Int,
      partial: Seq[Column],
      merge: Seq[Column]
  ): DataFrame = {
    val salted = df.withColumn("__salt", (rand(42) * factor).cast("int"))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
