package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class BloomExpressionsSpec extends SparkTestBase {

  test("long probe agrees exactly with the raw BloomFilter (no false negatives, fp parity)") {
    import spark.implicits._
    val members = (1L to 500L).map(_ * 7919L)
    val bloom = members.toDF("h").stat.bloomFilter("h", members.size.toLong, 0.03)
    val bc = spark.sparkContext.broadcast(bloom)
    val probe = (1L to 5000L).toDF("h")
    val got = probe.filter(BloomExpressions.mightContain(col("h"), bc))
      .collect().map(_.getLong(0)).toSet
    val want = (1L to 5000L).filter(bloom.mightContainLong).toSet
    assert(got == want) // bit-exact parity with the driver-side probe
    assert(members.filter(_ <= 5000L).forall(got), "bloom filters have no false negatives")
  }

  test("string probe is byte-identical to mightContainString (UTF8String bytes route)") {
    import spark.implicits._
    val members = (1 to 300).map(i => s"gram $i éü한") // non-ASCII exercises UTF-8 paths
    val bloom = members.toDF("g").stat.bloomFilter("g", members.size.toLong, 0.03)
    val bc = spark.sparkContext.broadcast(bloom)
    val probeVals = (1 to 1200).map(i => s"gram $i éü한")
    val got = probeVals.toDF("g").filter(BloomExpressions.mightContain(col("g"), bc))
      .collect().map(_.getString(0)).toSet
    val want = probeVals.filter(bloom.mightContainString).toSet
    assert(got == want)
  }

  test("interpreted eval matches the codegen'd path and nulls propagate") {
    import spark.implicits._
    val bloom = Seq(42L).toDF("h").stat.bloomFilter("h", 1L, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    // interpreted: eval on literal children (no codegen context)
    val interpreted = (1L to 200L).map(v =>
      BloomMightContain(Literal(v), bc).eval(null).asInstanceOf[Boolean])
    // codegen: the same probes through a projection
    val codegen = (1L to 200L).toDF("h")
      .select(col("h"), GraftBridge.column(
        BloomMightContain(GraftBridge.expression(col("h")), bc)).as("m"))
      .collect().sortBy(_.getLong(0)).map(_.getBoolean(1)).toSeq
    assert(interpreted == codegen)
    // null child -> null result (Predicate nullability follows the child)
    val viaNull = Seq[Option[Long]](Some(42L), None).toDF("h")
      .select(GraftBridge.column(
        BloomMightContain(GraftBridge.expression(col("h")), bc)).as("m"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0))).toSeq
    assert(viaNull == Seq(Some(true), None))
  }

  test("rejects non long/string children at analysis") {
    import spark.implicits._
    val bloom = Seq(1L).toDF("h").stat.bloomFilter("h", 1L, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1.5).toDF("x").filter(BloomExpressions.mightContain(col("x"), bc)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("bloom_might_contain"))
  }
}
