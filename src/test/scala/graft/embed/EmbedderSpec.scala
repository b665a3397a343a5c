package graft.embed

import graft.SparkTestBase

class EmbedderSpec extends SparkTestBase {

  private val e = new HashEmbedder(dim = 64)

  test("deterministic across calls and instances") {
    val a = e.embed("hello world")
    val b = new HashEmbedder(dim = 64).embed("hello world")
    assert(a.toSeq == b.toSeq)
  }

  test("unit L2 norm (E3), correct dim") {
    val v = e.embed("some text to embed for the norm test")
    assert(v.length == 64)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
  }

  test("empty text → zero vector (stays zero, no NaN)") {
    val v = e.embed("")
    assert(v.forall(x => x == 0f || !x.isNaN))
  }

  test("distinct texts get distinct vectors; similar texts closer than random") {
    val a = e.embed("spark query optimizer join")
    val b = e.embed("spark query optimizer joins")
    val c = e.embed("완전히 다른 한국어 텍스트")
    def cos(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q }.sum
    assert(cos(a, b) > cos(a, c))
  }

  test("batched mapPartitions embedding equals per-row embedding (E1)") {
    import spark.implicits._
    val df = (1 to 100).map(i => s"row number $i text").toDF("text")
    val out = Embedders.withEmbedding(df, "text", "embedding", e, batchSize = 32)
    val got = out.collect().map(r => r.getString(0) -> r.getSeq[Float](1))
    got.foreach { case (t, v) => assert(v == e.embed(t).toSeq) }
  }
}
