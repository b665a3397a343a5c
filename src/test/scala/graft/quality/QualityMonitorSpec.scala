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

  test("G3-G7: hand-computed 6-row fixture pins every aggregate exactly (VERDICT r3 #7)") {
    import spark.implicits._
    // chars  = [10, 20, 30, 40, 50, 70]   tokens = [100..600 step 100]
    // All expectations derived by hand (population moments):
    //   tokens: mean 350, median (300+400)/2 = 350,
    //           E[t²] = 910000/6, var = 910000/6 − 350² = 29166.666…,
    //           std = √29166.666… = 170.78251… → 170.7825
    //   chars:  mean 220/6 = 36.666…, median 35,
    //           var = 10400/6 − (220/6)² = 388.888…, std = 19.72026…
    val df = Seq(
      (10, 100, "en", "a.html"), (20, 200, "en", "a.html"), (30, 300, "en", "b.html"),
      (40, 400, "ko", "b.html"), (50, 500, "ko", "b.html"), (70, 600, "de", "c.html")
    ).toDF("chars", "tokens", "lang", "file")

    val g3 = QualityMonitor.sizeDistribution(df, "chars", "tokens").head()
    assert(g3.getAs[Long]("total_chunks") == 6L)
    assert(g3.getAs[Int]("min_chars") == 10 && g3.getAs[Int]("max_chars") == 70)
    assert(g3.getAs[Double]("avg_chars") == 36.6667)
    assert(g3.getAs[Double]("median_chars") == 35.0)
    assert(g3.getAs[Double]("std_chars") == 19.7203)
    assert(g3.getAs[Int]("min_tokens") == 100 && g3.getAs[Int]("max_tokens") == 600)
    assert(g3.getAs[Double]("avg_tokens") == 350.0)
    assert(g3.getAs[Double]("median_tokens") == 350.0)

    // G4 bin edges: lo=10, hi=70, 3 bins of width 20 → [10,30) [30,50)
    // [50,70]; the max value lands in the LAST bin via the least() clamp
    val g4 = QualityMonitor.histogram(df, "chars", bins = 3).collect()
      .map(r => r.getAs[Int]("bin") -> r.getAs[Long]("count")).toMap
    assert(g4 == Map(0 -> 2L, 1 -> 2L, 2 -> 2L))

    // G5: en 3/6 = 50%, ko 2/6 = 33.3333%, de 1/6 = 16.6667%, ordered
    // most-common-first with language tiebreak
    val g5 = QualityMonitor.languageDistribution(df, "lang").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("count"), r.getAs[Double]("pct")))
    assert(g5.toSeq == Seq(("en", 3L, 50.0), ("ko", 2L, 33.3333), ("de", 1L, 16.6667)))

    // G6: b.html(3) > a.html(2) > c.html(1); name tiebreak is pinned by
    // the two-row limit cutting exactly at the count boundary
    val g6 = QualityMonitor.topSources(df, "file", n = 2).collect()
      .map(r => (r.getAs[String]("file"), r.getAs[Long]("count")))
    assert(g6.toSeq == Seq(("b.html", 3L), ("a.html", 2L)))

    // G7: default gate [300, 500] keeps {300,400,500} → 3/6, boundary
    // values INCLUSIVE on both ends
    val g7 = df.agg(QualityMonitor.inRangeRatio(col("tokens")).as("r")).head().getDouble(0)
    assert(g7 == 0.5)
  }

  test("G10: report recommendation covers all three gate branches with pinned values") {
    import spark.implicits._
    // Branch 1 — in-range 3/6 = 50% < 70% ⇒ adjust_chunk_size;
    // CV = 170.78251…/350·100 = 48.795 (also pins std_tokens rounding)
    val spread = Seq(100, 200, 300, 400, 500, 600).toDF("tokens")
    val r1 = QualityMonitor.report(spread, "tokens").head()
    assert(r1.getAs[Double]("in_range_pct") == 50.0)
    assert(r1.getAs[Double]("std_tokens") == 170.7825)
    assert(r1.getAs[Double]("cv_pct") == 48.795)
    assert(r1.getAs[String]("recommendation") == "adjust_chunk_size")

    // Branch 2 — exactly 70% in range (NOT < 70%: pins the >= boundary)
    // with 3 extreme outliers: mean (7·400+3·3000)/10 = 1180,
    // var = (7·400² + 3·3000²)/10 − 1180² = 2812000 − 1392400 = 1419600,
    // CV = √1419600/1180·100 > 50 ⇒ high_variance
    val outliers = (Seq.fill(7)(400) ++ Seq.fill(3)(3000)).toDF("tokens")
    val r2 = QualityMonitor.report(outliers, "tokens").head()
    assert(r2.getAs[Double]("in_range_pct") == 70.0)
    val expCv = BigDecimal(math.sqrt(1419600.0) / 1180.0 * 100.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r2.getAs[Double]("cv_pct") == expCv && expCv > 50.0)
    assert(r2.getAs[String]("recommendation") == "high_variance")

    // Branch 3 — tight in-range distribution ⇒ ok
    val tight = Seq(350, 400, 400, 400, 450, 400).toDF("tokens")
    val r3 = QualityMonitor.report(tight, "tokens").head()
    assert(r3.getAs[Double]("in_range_pct") == 100.0)
    assert(r3.getAs[String]("recommendation") == "ok")
  }

  test("G10: reportJson serializes the report row and parses back losslessly") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val tight = Seq(350, 400, 400, 400, 450, 400).toDF("tokens")
    val json = QualityMonitor.reportJson(tight, "tokens").as[String].head()
    val schema = StructType(Seq(
      StructField("total_chunks", LongType), StructField("in_range_pct", DoubleType),
      StructField("cv_pct", DoubleType), StructField("avg_tokens", DoubleType),
      StructField("std_tokens", DoubleType), StructField("recommendation", StringType)))
    val back = spark.createDataset(Seq(json)).select(from_json(col("value"), schema).as("r"))
      .select("r.*").head()
    assert(back.getAs[Long]("total_chunks") == 6L)
    assert(back.getAs[Double]("in_range_pct") == 100.0)
    assert(back.getAs[String]("recommendation") == "ok")

    // empty corpus: every metric key still present (null, not omitted)
    // — the reference's json.dump always emits the full dict
    val emptyJson = QualityMonitor
      .reportJson(Seq.empty[Int].toDF("tokens"), "tokens").as[String].head()
    assert(emptyJson.contains("\"total_chunks\":0"))
    assert(emptyJson.contains("\"in_range_pct\":null"), emptyJson)
    assert(emptyJson.contains("\"cv_pct\":null"), emptyJson)
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

  test("sampleReviewByHash is partition-layout-independent (unlike rand(seed))") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val a = QualityMonitor.sampleReviewByHash(docs, "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val b = QualityMonitor.sampleReviewByHash(docs.repartition(13), "doc_id", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(a == b, "the review sample must not depend on partitioning")
    assert(a.distinct.size == 10)
  }
}
