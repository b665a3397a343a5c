package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SequencePackingSpec extends SparkTestBase {

  private def pack(rows: Seq[(String, Long, Long)], budget: Long, subShards: Int = 1) = {
    import spark.implicits._
    SequencePacking.packGreedy(
      rows.toDF("src", "id", "cost"), "src", "id", "cost", budget, subShards)
  }

  test("greedy fold: budget respected, blocks contiguous, oversize isolated") {
    val rows = Seq(
      ("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 60L), // 100+100 fits, +60 overflows
      ("a", 4L, 300L),                                  // oversize: own block
      ("a", 5L, 10L),
      ("b", 1L, 256L), ("b", 2L, 1L))
    val got = pack(rows, 256).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3), r.getInt(4)))
      .sortBy(t => (t._1, t._2))
    assert(got === Array(
      ("a", 1L, 0, 0), ("a", 2L, 0, 1), ("a", 3L, 1, 0), ("a", 4L, 2, 0),
      ("a", 5L, 3, 0), ("b", 1L, 0, 0), ("b", 2L, 1, 0)))
  }

  test("block sums never exceed budget except single-doc oversize blocks") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map(i => (s"s${i % 5}", i.toLong, (rnd.nextInt(120) + 1).toLong))
    val out = pack(rows, 256)
    val sums = out.groupBy("src", "block_id")
      .agg(sum("cost").as("s"), count(lit(1)).as("k"))
      .collect()
    sums.foreach { r =>
      val ok = r.getAs[Long]("s") <= 256 || r.getAs[Long]("k") == 1
      assert(ok, s"block over budget with >1 docs: $r")
    }
    // greedy is maximal: a block (except each group's last) plus the
    // first doc of the next block must overflow
    val byGroup = pack(rows, 256).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._1)
    byGroup.foreach { case (_, rs) =>
      val ordered = rs.sortBy(_._2)
      val blockSum = ordered.groupBy(_._4).map { case (b, xs) => b -> xs.map(_._3).sum }
      ordered.sliding(2).foreach {
        case Array(prev, next) if prev._4 != next._4 =>
          assert(blockSum(prev._4) + next._3 > 256,
            s"non-maximal block ${prev._4}: ${blockSum(prev._4)} + ${next._3}")
        case _ =>
      }
    }
  }

  test("no window in the plan; one exchange on the group key") {
    val rows = (1 to 50).map(i => (s"s${i % 3}", i.toLong, 10L))
    val plan = pack(rows, 64).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"packing must not plan a window:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1, s"expected exactly one exchange:\n$plan")
  }

  test("subShards: deterministic, partitions groups, block ids live per shard") {
    val rows = (1 to 200).map(i => (s"s${i % 2}", i.toLong, 50L))
    val a = pack(rows, 256, subShards = 4).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(4), r.getInt(5))).sortBy(t => (t._1, t._3))
    val b = pack(rows, 256, subShards = 4).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(4), r.getInt(5))).sortBy(t => (t._1, t._3))
    assert(a === b, "sub-sharded packing must be run-deterministic")
    assert(a.map(_._2).distinct.sorted === (0 until 4).toArray)
  }
}
