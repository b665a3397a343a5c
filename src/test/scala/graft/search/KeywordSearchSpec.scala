package graft.search

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** BM25 semantics pinned against hand-computed scores on a 4-doc
  * fixture (k1=1.2, b=0.75), both idf variants.
  */
class KeywordSearchSpec extends SparkTestBase {

  import spark.implicits._

  private def fixture = Seq(
    (0L, "spark join spark join spark"), // dl=5, tf(spark)=3
    (1L, "join merge sort"), // dl=3
    (2L, "spark"), // dl=1, tf=1
    (3L, "") // empty doc
  ).toDF("doc_id", "text")

  /** Reference-model BM25 in plain Scala. */
  private def bm25(
      tf: Double,
      df: Double,
      n: Double,
      dl: Double,
      avgdl: Double,
      rational: Boolean
  ): Double = {
    val k1 = 1.2; val b = 0.75
    val r = (n - df + 0.5) / (df + 0.5)
    val idf = if (rational) r else math.log(1.0 + r)
    if (tf <= 0) 0.0
    else idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
  }

  test("rational-idf scores match the hand model, ordered desc with id ties") {
    val out = KeywordSearch
      .bm25TopK(fixture, Seq("spark", "sort"), k = 10, rationalIdf = true)
      .collect()
    // n=4, avgdl = (5+3+1+0)/4 = 2.25; df(spark)=2, df(sort)=1
    val expect = Map(
      0L -> bm25(3, 2, 4, 5, 2.25, rational = true),
      1L -> bm25(1, 1, 4, 3, 2.25, rational = true),
      2L -> bm25(1, 2, 4, 1, 2.25, rational = true)
    )
    assert(out.map(_.getLong(0)).toSet == expect.keySet) // doc 3 filtered (no term)
    out.foreach { r =>
      val got = r.getDouble(r.fieldIndex("score")) // rounded to 6dp by the operator
      val want = expect(r.getLong(0))
      assert(math.abs(got - want) < 1e-6, s"doc ${r.getLong(0)}: $got vs $want")
    }
    // descending by score
    val scores = out.map(_.getDouble(out.head.fieldIndex("score"))).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("log idf is the default and damps the rare-term dominance") {
    val out = KeywordSearch
      .bm25TopK(fixture, Seq("spark", "sort"), k = 10)
      .collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("score")))
      .toMap
    val want = bm25(3, 2, 4, 5, 2.25, rational = false)
    assert(math.abs(out(0L) - want) < 1e-6)
  }

  test("per-term tf columns are emitted; absent term contributes zero everywhere") {
    val out = KeywordSearch
      .bm25TopK(fixture, Seq("spark", "nosuchterm"), k = 10, rationalIdf = true)
      .collect()
    assert(out.forall(_.getInt(out.head.fieldIndex("tf_nosuchterm")) == 0))
    assert(out.map(_.getLong(0)).toSet == Set(0L, 2L))
    val byId = out.map(r => r.getLong(0) -> r.getInt(r.fieldIndex("tf_spark"))).toMap
    assert(byId == Map(0L -> 3, 2L -> 1))
  }

  test("indexed variant matches the scan variant exactly on the real corpus") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val idx = KeywordSearch.buildIndex(docs)
    for (rational <- Seq(true, false)) {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSeq
      val scan = rows(
        KeywordSearch.bm25TopK(docs, Seq("dup", "vector"), 10, rationalIdf = rational))
      val indexed = rows(
        KeywordSearch.bm25TopKIndexed(idx, Seq("dup", "vector"), 10, rationalIdf = rational))
      assert(scan == indexed, s"rationalIdf=$rational")
    }
  }

  test("indexed variant touches only the query terms' postings") {
    val docs = fixture
    val idx = KeywordSearch.buildIndex(docs)
    // df for an absent term is 0 and contributes nothing; docs matching
    // only the absent term don't appear
    val out = KeywordSearch
      .bm25TopKIndexed(idx, Seq("spark", "nosuchterm"), 10, rationalIdf = true)
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(0L, 2L))
    // postings filter is pushed to the scan of the postings relation
    val plan = KeywordSearch
      .bm25TopKIndexed(idx, Seq("spark"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("term") && !plan.contains("CartesianProduct"))
  }

  test("k bounds the result and ties break by ascending id") {
    val dup = Seq((10L, "alpha"), (11L, "alpha"), (12L, "alpha")).toDF("doc_id", "text")
    val out = KeywordSearch.bm25TopK(dup, Seq("alpha"), k = 2, rationalIdf = true).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 11L)) // identical scores → id order
  }
}
