package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY.md §2.7 flags it
  * as the one UDAF shape the engine hadn't exercised): an exact
  * element-wise mean over a vector column. This is the distributed
  * centroid-update step of IVF/KMeans training expressed as a single
  * aggregate — partial buffers combine map-side like any built-in sum,
  * so one shuffle of (nlist · dim) doubles recomputes every centroid
  * at 100 TB.
  *
  * Accumulation is Double (every Float widens exactly), division
  * happens once in `finish`, so the result is the IEEE mean of the
  * group's vectors up to partial-sum reordering — identical contract
  * to Spark's own avg.
  */
case class VecMeanBuffer(var sum: Array[Double], var n: Long)

object VectorMeanAggregator extends Aggregator[Seq[Float], VecMeanBuffer, Seq[Double]] {

  override def zero: VecMeanBuffer = VecMeanBuffer(Array.emptyDoubleArray, 0L)

  override def reduce(b: VecMeanBuffer, a: Seq[Float]): VecMeanBuffer = {
    if (a == null) return b
    // The dimension is fixed by the FIRST vector reduced (n == 0), not by
    // the first non-empty one: a zero-length first vector pins dim 0, so a
    // later d-dim vector in the same group fails the require below exactly
    // like it would across partitions in merge — ragged behavior must not
    // depend on partition layout.
    if (b.n == 0L) b.sum = new Array[Double](a.length)
    require(b.sum.length == a.length,
      s"vector_mean over ragged vectors: ${b.sum.length} vs ${a.length}")
    var i = 0
    while (i < a.length) { b.sum(i) += a(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(x: VecMeanBuffer, y: VecMeanBuffer): VecMeanBuffer = {
    // n == 0 is the only "nothing accumulated" state: a buffer can
    // carry sum.isEmpty with n > 0 (zero-length input vectors), and
    // dropping its count would make the result depend on partition
    // layout — zero-dim vs d-dim mixes must fail exactly like reduce.
    if (y.n == 0L) return x
    if (x.n == 0L) return y
    require(x.sum.length == y.sum.length,
      s"vector_mean over ragged vectors: ${x.sum.length} vs ${y.sum.length}")
    var i = 0
    while (i < y.sum.length) { x.sum(i) += y.sum(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: VecMeanBuffer): Seq[Double] =
    if (b.n == 0L) Seq.empty else b.sum.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[VecMeanBuffer] = Encoders.product[VecMeanBuffer]

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object VectorAggregates {

  /** Column form: `df.groupBy("label").agg(vectorMean(col("embedding")))`. */
  def vectorMean(c: Column): Column =
    udaf(VectorMeanAggregator).apply(c)

  /** SQL form: `SELECT label, vector_mean(embedding) FROM t GROUP BY 1`. */
  def register(spark: SparkSession): Unit =
    spark.udf.register("vector_mean", udaf(VectorMeanAggregator))
}
