package graft

import graft.model.Doc

class PipelineSpec extends SparkTestBase {

  test("typed spine: Dataset[Doc] → Dataset[Chunk] with schema invariants") {
    import spark.implicits._
    val docs = Seq(
      Doc("s1", "a.html", "guides", "html", 100L, Some("T"),
        ("spark shuffles data between stages. " * 30).trim, "english", 1000),
      Doc("s2", "b.html", "guides", "html", 50L, None, "tiny", "english", 4)
    ).toDS()

    val chunks = Pipeline.docsToChunks(docs).collect()
    assert(chunks.nonEmpty)
    // doc 2 dropped (below the 10-char S8 floor)
    assert(chunks.forall(_.source == "s1"))
    chunks.foreach { c =>
      assert(c.chunk_id.length == 12)
      assert(c.embedding.length == 1024)
      val norm = math.sqrt(c.embedding.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-4)
      assert(c.chunk_size_chars == c.text.length)
      assert(c.collection == "docs_guides")
      assert(c.chunk_index < c.total_chunks)
    }
  }
}
