package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class VectorAggregatesSpec extends SparkTestBase {

  test("vector_mean equals the exploded per-dimension avg") {
    import spark.implicits._
    val df = Seq(
      (0, Seq(1.0f, 2.0f, 3.0f)),
      (0, Seq(3.0f, 2.0f, 1.0f)),
      (1, Seq(10.0f, 0.0f, -2.0f))
    ).toDF("label", "vec")

    val got = df.groupBy("label")
      .agg(VectorAggregates.vectorMean(col("vec")).as("m"))
      .orderBy("label").as[(Int, Seq[Double])].collect()

    assert(got(0) == ((0, Seq(2.0, 2.0, 2.0))))
    assert(got(1) == ((1, Seq(10.0, 0.0, -2.0))))
  }

  test("vector_mean matches built-in avg on the real embeddings (distributed combine)") {
    import spark.implicits._
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet").repartition(8)
    val viaAgg = e.groupBy("label")
      .agg(VectorAggregates.vectorMean(col("embedding")).as("m"))
      .select(col("label"), round(element_at(col("m"), 1), 9).as("d1"))
      .orderBy("label").as[(Int, Double)].collect().toSeq
    val viaAvg = e
      .select(col("label"), element_at(col("embedding"), 1).cast("double").as("v"))
      .groupBy("label").agg(round(avg("v"), 9).as("d1"))
      .orderBy("label").as[(Int, Double)].collect().toSeq
    assert(viaAgg == viaAvg)
  }

  test("SQL registration: vector_mean callable from spark.sql text") {
    import spark.implicits._
    VectorAggregates.register(spark)
    Seq((0, Seq(2.0f, 4.0f)), (0, Seq(4.0f, 8.0f))).toDF("label", "vec")
      .createOrReplaceTempView("va_sql_test")
    val m = spark.sql("SELECT vector_mean(vec) AS m FROM va_sql_test GROUP BY label")
      .as[Seq[Double]].head()
    assert(m == Seq(3.0, 6.0))
  }

  test("zero-length vectors count toward n regardless of partition layout") {
    import spark.implicits._
    // all-empty group: mean is Seq.empty, and the count is carried
    // through merge (a buffer with sum.isEmpty but n > 0 is NOT the
    // zero buffer)
    val df = Seq((0, Seq.empty[Float]), (0, Seq.empty[Float])).toDF("label", "vec")
      .repartition(4)
    val m = df.groupBy("label").agg(VectorAggregates.vectorMean(col("vec")).as("m"))
      .as[(Int, Seq[Double])].head()
    assert(m == ((0, Seq.empty[Double])))
  }

  test("zero-dim/d-dim mix fails deterministically even within one partition") {
    import spark.implicits._
    // ADVICE r7: before the fix, an empty vector followed by a d-dim one
    // in the SAME partition silently diluted the mean (sum allocated late,
    // n already incremented) while the cross-partition split threw in
    // merge. The dimension is now pinned by the first reduced vector, so
    // the mix fails identically regardless of layout.
    val df = Seq((0, Seq.empty[Float]), (0, Seq(1.0f, 2.0f))).toDF("label", "vec")
      .coalesce(1)
    val e = intercept[Exception] {
      df.groupBy("label").agg(VectorAggregates.vectorMean(col("vec")).as("m")).collect()
    }
    assert(e.getMessage.contains("ragged") || e.getCause != null)
  }

  test("empty and null handling") {
    import spark.implicits._
    val df = Seq((0, Option(Seq(1.0f, 1.0f))), (0, None)).toDF("label", "vec")
    val m = df.groupBy("label").agg(VectorAggregates.vectorMean(col("vec")).as("m"))
      .as[(Int, Seq[Double])].head()
    assert(m == ((0, Seq(1.0, 1.0))))
  }
}
