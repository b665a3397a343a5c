package graft.functions

import graft.SparkTestBase

class GraftFunctionsSpec extends SparkTestBase {

  test("registerAll exposes dot_product to spark.sql") {
    GraftFunctions.registerAll(spark)
    val r = spark
      .sql("SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head()
      .getDouble(0)
    assert(r == 11.0)
  }

  test("registered function participates in codegen over a table") {
    GraftFunctions.registerAll(spark)
    spark.read.parquet(s"${sf()}/embeddings.parquet").createOrReplaceTempView("emb")
    val rows = spark.sql(
      """SELECT vec_id, dot_product(embedding, embedding) AS n2 FROM emb ORDER BY vec_id LIMIT 5"""
    ).collect()
    // unit vectors → squared norm ~ 1
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-3))
  }

  test("wrapped Column functions: SQL text equals the Column API result") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(50).cache()
    docs.createOrReplaceTempView("gf_docs")

    val viaSql = spark.sql(
      """SELECT doc_id, graft_clean_text(text) AS cleaned, detect_language(text) AS lang,
                estimate_tokens(text) AS toks, quality_score(text) AS q,
                fingerprint64(text) AS fp
         FROM gf_docs ORDER BY doc_id""").collect()
    val viaCols = docs.select(
      col("doc_id"),
      graft.clean.TextCleaner.cleanText(col("text")).as("cleaned"),
      graft.lang.LanguageDetect.detectContentLanguage(col("text")).as("lang"),
      graft.lang.LanguageDetect.estimateTokens(col("text")).as("toks"),
      graft.text.TextAnalysis.qualityScore(col("text")).as("q"),
      graft.text.TextAnalysis.fingerprint64(col("text")).as("fp")
    ).orderBy("doc_id").collect()
    assert(viaSql.toSeq == viaCols.toSeq)

    val cos = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT)))")
      .head().getDouble(0)
    assert(cos == 0.0)
    docs.unpersist()
  }

  test("wrong arity yields a named error, not IndexOutOfBounds") {
    GraftFunctions.registerAll(spark)
    val e = intercept[Exception](spark.sql("SELECT cosine_sim(array(CAST(1.0 AS FLOAT)))").head())
    assert(e.getMessage.contains("cosine_sim expects 2 arguments"))
  }

  test("registerAll also registers the vector_mean UDAF") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    Seq((0, Seq(2.0f, 6.0f))).toDF("label", "vec").createOrReplaceTempView("gf_vm")
    val m = spark.sql("SELECT vector_mean(vec) FROM gf_vm GROUP BY label")
      .as[Seq[Double]].head()
    assert(m == Seq(2.0, 6.0))
  }

  test("GraftExtensions is instantiable for spark.sql.extensions") {
    // deployment path smoke: the class must be a no-arg
    // (SparkSessionExtensions => Unit) — instantiation is what the
    // session builder does reflectively
    val ext = new GraftExtensions()
    assert(ext.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }

  test("extensions path registers the same surface as registerAll, vector_mean included") {
    import org.apache.spark.sql.{GraftBridge, SparkSessionExtensions}
    import spark.implicits._
    // Replay the injected functions the way session build would, then
    // call the UDAF from SQL — proves the two deployment paths expose
    // the identical function set (ADVICE r7).
    GraftFunctions.unregisterAll(spark)
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    GraftBridge.applyInjectedFunctions(spark, ext)
    try {
      Seq((0, Seq(2.0f, 6.0f)), (0, Seq(4.0f, 0.0f))).toDF("label", "vec")
        .createOrReplaceTempView("gf_ext_vm")
      val m = spark.sql("SELECT vector_mean(vec) FROM gf_ext_vm GROUP BY label")
        .as[Seq[Double]].head()
      assert(m == Seq(3.0, 3.0))
      val d = spark
        .sql("SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))")
        .head().getDouble(0)
      assert(d == 11.0)
    } finally {
      spark.catalog.dropTempView("gf_ext_vm")
      GraftFunctions.unregisterAll(spark)
    }
  }

  test("withRegistered leaves pre-existing functions registered (extensions deployment)") {
    GraftFunctions.unregisterAll(spark)
    try {
      // simulate the extensions-deployed session: surface already live
      GraftFunctions.registerAll(spark)
      GraftFunctions.withRegistered(spark) {
        assert(spark.sql("SELECT dot_product(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT)))")
          .head().getDouble(0) == 2.0)
      }
      // the scoped call must NOT have stripped the deployed surface
      assert(GraftFunctions.names.forall(spark.catalog.functionExists))

      // fresh-session shape: nothing pre-exists → everything is cleaned up
      GraftFunctions.unregisterAll(spark)
      GraftFunctions.withRegistered(spark)(())
      assert(!GraftFunctions.names.exists(spark.catalog.functionExists))
    } finally GraftFunctions.unregisterAll(spark)
  }
}
