package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {

  test("binned interval join equals the naive non-equi join") {
    import spark.implicits._
    val points = (0L to 500L).map(i => (i, i * 7L % 400L)).toDF("pid", "t")
    val intervals = Seq(
      (1L, 10L, 40L), (2L, 35L, 60L), (3L, 100L, 100L), (4L, 380L, 500L), (5L, 0L, 3L)
    ).toDF("iid", "s", "e")

    val naive = points
      .join(intervals, col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet

    for (binSize <- Seq(1L, 7L, 64L, 1000L)) {
      val binned = RangeJoin
        .intervalJoin(points, "t", intervals, "s", "e", binSize)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(binned == naive, s"binSize=$binSize diverged from naive join")
    }
  }

  test("pairs are unique (each match meets in exactly one bin)") {
    import spark.implicits._
    val points = Seq((1L, 50L)).toDF("pid", "t")
    val intervals = Seq((9L, 0L, 1000L)).toDF("iid", "s", "e") // spans many bins
    val rows = RangeJoin.intervalJoin(points, "t", intervals, "s", "e", 10L).collect()
    assert(rows.length == 1)
  }

  test("exact integer binning at epoch-micros magnitudes (no double rounding)") {
    import spark.implicits._
    // 1.7e15 µs epochs: a double-rounded bin id drops boundary matches
    val base = 1700000000000000L
    val points = Seq((1L, base), (2L, base + 599999999L), (3L, base + 600000000L)).toDF("pid", "t")
    val intervals = Seq((1L, base, base + 599999999L)).toDF("iid", "s", "e")
    val got = RangeJoin.intervalJoin(points, "t", intervals, "s", "e", 600000000L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("refuses __bin collisions and shared column names (ADVICE r7)") {
    import spark.implicits._
    val points = Seq((1L, 5L)).toDF("pid", "t")
    val intervals = Seq((1L, 0L, 10L)).toDF("iid", "s", "e")
    val withBin = points.withColumn("__bin", lit(0L))
    val eBin = intercept[IllegalArgumentException](
      RangeJoin.intervalJoin(withBin, "t", intervals, "s", "e", 10L))
    assert(eBin.getMessage.contains("__bin"))
    val shared = intervals.withColumnRenamed("iid", "pid") // collides with points.pid
    val eShared = intercept[IllegalArgumentException](
      RangeJoin.intervalJoin(points, "t", shared, "s", "e", 10L))
    assert(eShared.getMessage.contains("share column names"))
  }

  test("plans as an equi-join, not a nested-loop cross product") {
    import spark.implicits._
    val points = (0L to 100L).map(i => (i, i)).toDF("pid", "t")
    val intervals = Seq((1L, 10L, 40L)).toDF("iid", "s", "e")
    val plan = RangeJoin.intervalJoin(points, "t", intervals, "s", "e", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a non-equi plan:\n$plan")
  }
}
