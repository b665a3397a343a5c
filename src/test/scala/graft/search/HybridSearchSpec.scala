package graft.search

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** RRF fusion pinned against hand-computed reciprocal-rank sums. */
class HybridSearchSpec extends SparkTestBase {

  import spark.implicits._

  test("rrfFuse sums 1/(k+rank) per ranking, 0 where absent, ties by id") {
    val dense = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val sparse = Seq((2L, 1), (4L, 2), (1L, 3)).toDF("doc_id", "rank")
    val out = HybridSearch
      .rrfFuse(Seq("vec" -> dense, "kw" -> sparse), k = 10)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), r.getDouble(3)))

    def rr(r: Int) = 1.0 / (60 + r)
    val expect = Map(
      1L -> (rr(1) + rr(3)),
      2L -> (rr(2) + rr(1)),
      3L -> rr(3),
      4L -> rr(2)
    )
    assert(out.length == 4)
    out.foreach { case (id, _, _, rrf) =>
      assert(math.abs(rrf - expect(id)) < 1e-6, s"doc $id")
    }
    // doc 2 (ranks 2+1) outranks doc 1 (ranks 1+3); absent ranks are null
    assert(out.head._1 == 2L)
    val d3 = out.find(_._1 == 3L).get
    assert(d3._2.contains(3) && d3._3.isEmpty)
    // docs 3 and 4 tie on a single rank-membership shape but not score;
    // equal-score ties fall back to ascending id:
    val tied = HybridSearch
      .rrfFuse(
        Seq("a" -> Seq((7L, 1), (5L, 2)).toDF("doc_id", "rank"),
            "b" -> Seq((5L, 1), (7L, 2)).toDF("doc_id", "rank")),
        k = 10
      )
      .collect()
      .map(_.getLong(0))
    assert(tied.toSeq == Seq(5L, 7L)) // identical fused scores → id order
  }

  test("withRank ranks a k-row result deterministically without a partition warning") {
    val topk = Seq((3L, 0.9), (1L, 0.9), (2L, 0.5)).toDF("doc_id", "score")
    val ranked = HybridSearch
      .withRank(topk, Seq(desc("score"), col("doc_id")))
      .collect()
      .map(r => r.getLong(0) -> r.getInt(r.fieldIndex("rank")))
      .toMap
    assert(ranked == Map(1L -> 1, 3L -> 2, 2L -> 3))
  }

  test("kConst shifts the fusion weighting") {
    val a = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val out = HybridSearch
      .rrfFuse(Seq("only" -> a), k = 10, kConst = 0)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("rrf")))
      .toMap
    assert(math.abs(out(1L) - 1.0) < 1e-9 && math.abs(out(2L) - 0.5) < 1e-9)
  }
}
