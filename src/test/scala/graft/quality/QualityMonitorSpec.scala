package graft.quality

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QualityMonitorSpec extends SparkTestBase {

  test("G9: seeded sample review is deterministic and sized") {
    import spark.implicits._
    val df = (1 to 1000).toDF("x")
    val a = QualityMonitor.sampleReview(df, 7, seed = 42).collect().map(_.getInt(0)).toSeq
    val b = QualityMonitor.sampleReview(df, 7, seed = 42).collect().map(_.getInt(0)).toSeq
    assert(a.length == 7)
    assert(a == b)
    val c = QualityMonitor.sampleReview(df, 7, seed = 43).collect().map(_.getInt(0)).toSeq
    assert(a != c)
  }

  test("G4: histogram handles a constant column (degenerate width)") {
    import spark.implicits._
    val df = Seq.fill(50)(7).toDF("x")
    val h = QualityMonitor.histogram(df, "x", bins = 10).collect()
    assert(h.length == 1)
    assert(h.head.getAs[Long]("count") == 50L)
  }

  test("G3/G8: population stddev parity (ddof=0)") {
    import spark.implicits._
    // numpy std([1,2,3,4]) = sqrt(1.25) ≈ 1.11803 (population)
    val df = Seq(1, 2, 3, 4).toDF("t")
    val row = df.agg(round(stddev_pop(col("t")), 5).as("s")).head()
    assert(row.getDouble(0) == 1.11803)
    val cv = df.agg(round(QualityMonitor.coefficientOfVariation(col("t")), 4)).head().getDouble(0)
    assert(cv == 44.7214) // 1.118/2.5*100
  }
}
