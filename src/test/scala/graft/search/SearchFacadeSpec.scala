package graft.search

import graft.SparkTestBase
import graft.embed.HashEmbedder
import org.apache.spark.sql.functions._

class SearchFacadeSpec extends SparkTestBase {

  private val embedder = new HashEmbedder(dim = 64)

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "스파크는 분산 데이터 처리 엔진입니다 조인과 집계를 지원합니다", "korean"),
      (2L, "spark is a distributed engine for joins and aggregation", "english"),
      (3L, "another english document about query optimization and windows", "english"),
      (4L, "한국어 문서 하나 더 검색 품질 테스트용", "korean")
    ).toDF("id", "text", "language")
      .withColumn("embedding", graft.embed.Embedders.embedUdf(embedder)(col("text")))
  }

  test("Q6: query language auto-detect drives the metadata filter") {
    val ko = SearchFacade.search(corpus, "스파크 조인 지원", embedder, k = 2)
    assert(ko.collect().forall(_.getAs[String]("language") == "korean"))
    val en = SearchFacade.search(corpus, "spark joins", embedder, k = 2)
    assert(en.collect().forall(_.getAs[String]("language") == "english"))
  }

  test("Q6: explicit filter overrides detection; no-filter regression returns rows") {
    val explicit = SearchFacade.search(corpus, "spark joins", embedder, k = 2, filterLanguage = Some("korean"))
    assert(explicit.collect().forall(_.getAs[String]("language") == "korean"))
    // reference test_no_filter.py regression: filter off must return rows
    val noFilter = SearchFacade.search(corpus, "spark joins", embedder, k = 4, autoDetectLanguage = false)
    assert(noFilter.count() == 4)
  }

  test("C15 driver-side variant matches Column variant thresholds") {
    assert(SearchFacade.detectQueryLanguageScala("") == "english")
    assert(SearchFacade.detectQueryLanguageScala("한국어 질의입니다") == "korean")
    assert(SearchFacade.detectQueryLanguageScala("hello world") == "english")
  }

  test("Q7: RAG prompt numbers the top-k context docs") {
    val top = SearchFacade.search(corpus, "spark joins", embedder, k = 2)
    val messages = SearchFacade.ragPrompt(top, "what is spark?")
    assert(messages.length == 2)
    val (role, sys) = messages.head
    assert(role == "system")
    assert(sys.contains("문서 1:"))
    assert(sys.contains("문서 2:"))
    assert(messages(1) == ("user" -> "what is spark?"))
  }

  test("searchBatch materializes once and matches per-query search exactly") {
    val queries = Seq(("ko", "스파크 조인 지원"), ("en", "spark joins"))
    val batch = SearchFacade.searchBatch(corpus, queries, embedder, k = 2, extraCols = Seq("id"))
    assert(batch.map(_._1) == queries.map(_._1))
    for (((tag, hits), (_, q)) <- batch.zip(queries)) {
      val naive = SearchFacade.search(corpus, q, embedder, k = 2)
        .select("id", "language", "score").collect().toSeq
      assert(hits.select("id", "language", "score").collect().toSeq == naive,
        s"batch result for $tag diverged from per-query search")
      // the batch side must run over materialized blocks, not re-derive
      // the upstream plan: its physical plan carries a checkpointed scan
      val plan = hits.queryExecution.optimizedPlan.toString
      assert(plan.contains("LogicalRDD") || plan.contains("ExistingRDD"),
        s"batch search did not materialize the collection:\n$plan")
    }
  }

  test("Q8: QA battery emits (query, rank, score) rows") {
    implicit val s = spark
    val out = SearchFacade.qaBattery(corpus, Seq("spark joins", "스파크"), embedder, k = 2)
    assert(out.count() == 4)
    assert(out.select("rank").distinct().collect().map(_.getInt(0)).toSet == Set(1, 2))
  }
}
