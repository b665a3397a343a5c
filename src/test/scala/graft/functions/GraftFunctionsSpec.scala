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

  test("GraftExtensions is instantiable for spark.sql.extensions") {
    // deployment path smoke: the class must be a no-arg
    // (SparkSessionExtensions => Unit) — instantiation is what the
    // session builder does reflectively
    val ext = new GraftExtensions()
    assert(ext.isInstanceOf[org.apache.spark.sql.SparkSessionExtensions => Unit])
  }
}
