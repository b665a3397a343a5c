package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._

/** Binned interval join — the scale-safe form of the non-equi
  * point-in-interval join (SURVEY.md §2.7 lists range joins among the
  * categories the reference lacks; streaming/batch event attribution
  * needs them constantly).
  *
  * A raw `points JOIN intervals ON p BETWEEN s AND e` has no equi key,
  * so Spark plans BroadcastNestedLoopJoin — O(|points|·|intervals|)
  * comparisons, a non-starter once both sides are large. Binning turns
  * it into an equi-join: every point maps to ONE bin of width
  * `binSize`; every interval explodes to the bins it overlaps; the
  * bin equi-join shuffles hash-partitioned like any other join, and
  * the exact BETWEEN filter runs post-join. Each matching (point,
  * interval) pair meets in exactly one bin — the point's own — so the
  * result needs no dedup.
  *
  * Cost model: interval fan-out is ⌈len/binSize⌉+1 rows, so pick
  * binSize near the TYPICAL interval length (fan-out ~2). Point-heavy
  * hot bins are ordinary join skew — AQE's skew-join split applies,
  * or [[SkewTools.saltedJoin]] for the pathological cases.
  *
  * Bin arithmetic is exact integer floor-division (`div` + `pmod`),
  * not double math — microsecond epochs exceed 2^53 well before 2^63,
  * and a double-rounded bin id would silently drop boundary matches.
  */
object RangeJoin {

  private def floorDiv(c: Column, d: Long): Column =
    GraftBridge.column(
      IntegralDivide(
        GraftBridge.expression(c - pmod(c, lit(d))),
        GraftBridge.expression(lit(d))))

  /** Join every row of `points` to every row of `intervals` whose
    * [startCol, endCol] (inclusive both ends) contains its `pointCol`.
    * The long-typed columns are the caller's unit (epoch micros,
    * seconds, plain numbers — any integral domain).
    */
  def intervalJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binSize: Long
  ): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    // The bin key is an internal artifact: refuse inputs that already carry
    // it (it would be silently overwritten), and refuse shared column names
    // (the post-join BETWEEN filter could resolve to the wrong side).
    require(!points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "inputs must not contain a __bin column")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals must not share column names: ${shared.mkString(", ")}")
    val p = points.withColumn("__bin", floorDiv(col(pointCol), binSize))
    val i = intervals
      .withColumn("__bin", explode(sequence(floorDiv(col(startCol), binSize), floorDiv(col(endCol), binSize))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
