package graft.search

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** SQ8 quantization: code/decode math pinned on a hand fixture, error
  * bound, constant-dimension handling, and recall vs exact search on
  * real testdata embeddings.
  */
class ScalarQuantSpec extends SparkTestBase {

  import spark.implicits._

  test("fit produces per-dimension [min,max] arrays in dimension order") {
    val df = Seq(
      (0L, Array(0.0f, 10.0f, 5.0f)),
      (1L, Array(1.0f, -10.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val row = ScalarQuant.fit(df).collect()(0)
    assert(row.getSeq[Double](row.fieldIndex("mns")) == Seq(0.0, -10.0, 5.0))
    assert(row.getSeq[Double](row.fieldIndex("mxs")) == Seq(1.0, 10.0, 5.0))
  }

  test("encode clamps to [0,255], maps min→0 / max→255ish, constant dim → 0") {
    val df = Seq(
      (0L, Array(0.0f, 10.0f, 5.0f)),
      (1L, Array(1.0f, -10.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val stats = ScalarQuant.fit(df)
    val codes = ScalarQuant
      .encode(df, stats)
      .orderBy("vec_id")
      .collect()
      .map(r => r.getSeq[Int](r.fieldIndex("code")))
    // doc 0: dim0 at min → 0; dim1 at max → floor(255·(20/20)) clamped → 255; dim2 constant → 0
    assert(codes(0) == Seq(0, 255, 0))
    assert(codes(1) == Seq(255, 0, 0))
  }

  test("midpoint decode error is bounded by half a quantization step per dimension") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val stats = ScalarQuant.fit(emb)
    val maxErr = ScalarQuant
      .encode(emb, stats)
      .crossJoin(broadcast(stats))
      .withColumn("dv", ScalarQuant.decodeExpr(col("code"), col("mns"), col("mxs")))
      .select(
        max(
          aggregate(
            zip_with(col("embedding").cast("array<double>"), col("dv"), (x, y) => abs(x - y)),
            lit(0.0),
            (acc, e) => greatest(acc, e)
          )
        ).as("err"),
        max(
          aggregate(
            zip_with(col("mxs"), col("mns"), (a, b) => (a - b) / 255.0 / 2.0),
            lit(0.0),
            (acc, e) => greatest(acc, e)
          )
        ).as("halfstep")
      )
      .collect()(0)
    // global bound: worst per-dim error ≤ worst half step (+ float→double slack)
    assert(maxErr.getDouble(0) <= maxErr.getDouble(1) * (1.0 + 1e-9) + 1e-12)
  }

  test("quantized top-10 recalls ≥0.8 of exact top-10 on testdata") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val qv = emb.filter(col("vec_id") === 7).select("embedding").head().getSeq[Float](0).toArray
    val exact = VectorSearch
      .topK(emb, qv, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val quant = ScalarQuant
      .quantizedTopK(emb, qv, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert((exact intersect quant).size >= 8, s"recall too low: $exact vs $quant")
  }

  test("searchTopK over a pre-encoded corpus matches quantizedTopK") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val qv = emb.filter(col("vec_id") === 7).select("embedding").head().getSeq[Float](0).toArray
    val stats = ScalarQuant.fit(emb)
    val viaStore = ScalarQuant
      .searchTopK(ScalarQuant.encode(emb, stats), stats, qv, 10)
      .select("vec_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val oneShot = ScalarQuant
      .quantizedTopK(emb, qv, 10)
      .select("vec_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaStore == oneShot)
  }

  test("codegen encode/decode match the HOF formulations bit-for-bit (incl. clamp + constant dims)") {
    import spark.implicits._
    // real embeddings + handcrafted rows exercising clamp-below/above
    // and a constant dimension — stats from the real table, fixture
    // rows scored against the same stats so out-of-range values clamp
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .select("vec_id", "embedding").limit(200)
    val stats = ScalarQuant.fit(emb)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val fixture = Seq(
      (100000L, Array.fill(dim)(99.0f)),   // clamps to 255 everywhere
      (100001L, Array.fill(dim)(-99.0f)),  // clamps to 0 everywhere
      (100002L, Array.fill(dim)(0.0f))
    ).toDF("vec_id", "embedding")
    val both = emb.unionByName(fixture)
      .crossJoin(broadcast(stats))
      .withColumn("code_fast", ScalarQuant.encodeExpr(col("embedding"), col("mns"), col("mxs")))
      .withColumn("code_hof", ScalarQuant.encodeExprHof(col("embedding"), col("mns"), col("mxs")))
      .withColumn("dv_fast", ScalarQuant.decodeExpr(col("code_fast"), col("mns"), col("mxs")))
      .withColumn("dv_hof", ScalarQuant.decodeExprHof(col("code_hof"), col("mns"), col("mxs")))
      .select("code_fast", "code_hof", "dv_fast", "dv_hof")
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1))
      assert(r.getSeq[Double](2) == r.getSeq[Double](3))
    }
  }
}
