package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkTestBase {

  test("backward as-of: most recent right row at-or-before, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 100L),
      (2L, "u1", 250L),
      (3L, "u2", 50L)
    ).toDF("event_id", "user", "t")
    val right = Seq(
      ("u1", 90L, 90L, 1.0),
      ("u1", 100L, 100L, 2.0), // equal time — visible to left t=100
      ("u1", 200L, 200L, 3.0),
      ("u2", 60L, 60L, 4.0) // after left's only row — never matched
    ).toDF("user", "t", "rt", "v")

    val out = AsofJoin.asofBackward(left, right, Seq("user"), "t", Seq("rt", "v"))
      .orderBy("event_id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("asof_rt") == 100L) // equal timestamp wins over 90
    assert(out(0).getAs[Double]("asof_v") == 2.0)
    assert(out(1).getAs[Long]("asof_rt") == 200L)
    assert(out(2).isNullAt(out(2).fieldIndex("asof_rt"))) // no earlier right row
  }

  test("tolerance masks stale matches") {
    import spark.implicits._
    val left = Seq((1L, "u1", 1000L)).toDF("event_id", "user", "t")
    val right = Seq(("u1", 100L, 5.0)).toDF("user", "t", "v")
    val strict = AsofJoin.asofBackward(left, right, Seq("user"), "t", Seq("v"), tolerance = Some(lit(500L)))
      .collect().head
    assert(strict.isNullAt(strict.fieldIndex("asof_v")))
    val loose = AsofJoin.asofBackward(left, right, Seq("user"), "t", Seq("v"), tolerance = Some(lit(2000L)))
      .collect().head
    assert(loose.getAs[Double]("asof_v") == 5.0)
  }

  test("single shuffle: exactly one Exchange in the plan") {
    import spark.implicits._
    val left = Seq((1L, "u1", 100L)).toDF("event_id", "user", "t")
    val right = Seq(("u1", 90L, 1.0)).toDF("user", "t", "v")
    val out = AsofJoin.asofBackward(left, right, Seq("user"), "t", Seq("v"))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one keyed shuffle:\n$plan")
  }
}
