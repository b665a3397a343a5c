package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the r19 q_approx_quantile restructure: the histogram +
  * cumulative-window + bracket-lookup replay of the exact percentile
  * must be BIT-IDENTICAL to catalyst's `percentile()` aggregate — the
  * replay exists only for parallelism (the aggregate's final merge is
  * one reduce task over every distinct key), never for a different
  * answer. The interpolation formula is the one decompiled from
  * PercentileBase.getPercentile (spark-catalyst 4.1.2):
  *
  *   pos    = p · (N − 1)
  *   lower  = floor(pos); higher = ceil(pos)
  *   lowerKey  = first key whose cumulative count ≥ lower + 1
  *   higherKey = first key whose cumulative count ≥ higher + 1
  *   result = lowerKey                      when higher == lower
  *          = lowerKey                      when higherKey == lowerKey
  *          = (higher−pos)·lowerKey + (pos−lower)·higherKey
  *
  * Shapes chosen adversarially: odd/even N (integral vs fractional
  * pos), heavy ties (bracket keys equal), N = 1, N = 2, and the real
  * sf0.001 lineitem cents column.
  */
class ApproxQuantileParitySpec extends SparkTestBase {

  private val pcts = Seq(0.5, 0.95)

  /** The replay, exactly as qApproxQuantile builds it. */
  private def replay(values: Seq[Long]): Seq[Double] = {
    import spark.implicits._
    val df = values.toDF("cents")
    val n = df.count()
    val pos = pcts.map(p => p * (n - 1))
    val ranks = pos.flatMap(q => Seq(math.floor(q).toLong + 1, math.ceil(q).toLong + 1))
    val wcum = Window.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df.groupBy("cents").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wcum))
    val bracketCols = ranks.zipWithIndex.map { case (k, i) =>
      min(when(col("cum") >= k, col("cents"))).as(s"k$i")
    }
    val row = cum.agg(bracketCols.head, bracketCols.tail: _*).head()
    def interp(qpos: Double, lowerKey: Long, higherKey: Long): Double = {
      val lower = math.floor(qpos).toLong
      val higher = math.ceil(qpos).toLong
      if (higher == lower || higherKey == lowerKey) lowerKey.toDouble
      else (higher - qpos) * lowerKey.toDouble + (qpos - lower) * higherKey.toDouble
    }
    Seq(interp(pos(0), row.getLong(0), row.getLong(1)),
      interp(pos(1), row.getLong(2), row.getLong(3)))
  }

  private def aggregateForm(values: Seq[Long]): Seq[Double] = {
    import spark.implicits._
    values.toDF("cents")
      .agg(expr("percentile(cents, array(0.5D, 0.95D))"))
      .head().getSeq[Double](0)
  }

  private def assertBitEqual(values: Seq[Long], label: String): Unit = {
    val a = aggregateForm(values)
    val b = replay(values)
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(java.lang.Double.doubleToRawLongBits(x) ==
        java.lang.Double.doubleToRawLongBits(y),
        s"$label pct=${pcts(i)}: percentile()=$x replay=$y")
    }
  }

  test("singleton and pair inputs (pos edge cases)") {
    assertBitEqual(Seq(7L), "n=1")
    assertBitEqual(Seq(7L, 9L), "n=2")
    assertBitEqual(Seq(-3L, -3L), "n=2 tied")
  }

  test("odd and even N, distinct values (fractional vs integral pos)") {
    assertBitEqual((1L to 101L), "n=101")
    assertBitEqual((1L to 100L), "n=100")
    // non-uniform gaps so interpolation actually mixes two keys
    assertBitEqual(Seq(1L, 2L, 10L, 100L, 1000L, 10000L), "gaps")
  }

  test("heavy ties (bracket keys collapse)") {
    assertBitEqual(Seq.fill(50)(5L) ++ Seq.fill(50)(6L), "two-value 50/50")
    assertBitEqual(Seq.fill(94)(5L) ++ Seq.fill(6)(6L), "p95 straddles the tie edge")
    assertBitEqual(Seq.fill(100)(5L), "all tied")
  }

  test("deterministic pseudo-random multiset") {
    // xorshift values with duplicates (mod squeezes the range)
    var x = 0x9E3779B97F4A7C15L
    val vs = (1 to 5000).map { _ =>
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      math.floorMod(x, 700L)
    }
    assertBitEqual(vs, "xorshift multiset")
  }

  test("real corpus: sf0.001 lineitem cents") {
    val cents = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select(round(col("l_extendedprice") * lit(100)).cast("long").as("cents"))
      .collect().map(_.getLong(0)).toSeq
    assertBitEqual(cents, "sf0.001 lineitem")
  }
}
