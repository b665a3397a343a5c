package graft.chunk

import graft.SparkTestBase
import graft.model.ChunkerConfig
import org.apache.spark.sql.functions._
import scala.util.Random

class ChunkerSpec extends SparkTestBase {

  private val cfg = ChunkerConfig.default
  private val splitter = new RecursiveSplitter(cfg)

  test("split respects target size when separators exist") {
    val doc = (1 to 40).map(i => s"para $i sentence one. sentence two here.").mkString("\n\n")
    val chunks = splitter.split(doc)
    assert(chunks.nonEmpty)
    chunks.foreach(c => assert(c.length <= cfg.targetChunkSize, s"chunk len ${c.length}"))
  }

  test("separator-free blob hard-splits at target size") {
    val blob = "x" * 10000
    val chunks = splitter.split(blob)
    assert(chunks.forall(_.length <= cfg.targetChunkSize))
    // hard splits with overlap: coverage of all content
    assert(chunks.map(_.length).sum >= blob.length)
  }

  test("chunks reconstruct the source (coverage property, 50 seeded cases)") {
    val rng = new Random(42)
    val vocab = Seq("alpha", "beta gamma", "delta.", "eps\n\nzeta")
    (1 to 50).foreach { _ =>
      val parts = Seq.fill(rng.nextInt(60) + 1)(vocab(rng.nextInt(vocab.length)))
      val doc = parts.mkString(" ")
      val chunks = splitter.split(doc)
      if (doc.trim.nonEmpty) {
        // every chunk is a substring of the source
        chunks.foreach(c => assert(doc.contains(c), s"chunk not substring: $c"))
        // ordered concat covers the trimmed source end
        assert(chunks.isEmpty || doc.trim.endsWith(chunks.last.trim.takeRight(10)))
      }
    }
  }

  test("merger joins small chunks without exceeding max (K3)") {
    val a40 = "a" * 40
    val b40 = "b" * 40
    val merged = ChunkMerger.merge(Seq(a40, b40), cfg.minChunkSize, cfg.maxChunkSize)
    assert(merged == Seq(a40 + "\n" + b40))
  }

  test("merger refuses merges that would exceed max (K3)") {
    val a80 = "a" * 80
    val b480 = "b" * 480
    val merged = ChunkMerger.merge(Seq(a80, b480), cfg.minChunkSize, cfg.maxChunkSize)
    assert(merged == Seq(a80, b480))
  }

  test("merge never produces a chunk beyond max when inputs are within max (100 seeded cases)") {
    val rng = new Random(7)
    (1 to 100).foreach { _ =>
      val sizes = Seq.fill(rng.nextInt(30))(rng.nextInt(500) + 1)
      val chunks = sizes.map(n => "x" * n)
      val merged = ChunkMerger.merge(chunks, cfg.minChunkSize, cfg.maxChunkSize)
      merged.foreach(c => assert(c.length <= cfg.maxChunkSize))
      // total content preserved (joins add 1 char per merge)
      assert(merged.map(_.replace("\n", "").length).sum == sizes.sum)
    }
  }

  test("explodeChunks metadata is consistent (K4/C16/C17), shuffle-free") {
    import spark.implicits._
    val docs = Seq(
      (1L, "src1", ("hello world. " * 100).trim),
      (2L, "src2", "short doc"),
      (3L, "src3", "")
    ).toDF("doc_id", "source", "text")
    val out = Chunker.explodeChunks(docs, "text", "source")
    val rows = out.orderBy("doc_id", "chunk_index").collect()
    // doc 3 (empty) contributes no rows
    assert(rows.map(_.getLong(0)).distinct.toSeq == Seq(1L, 2L))
    // per-doc: chunk_index 0..total-1, total matches, sizes correct
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val total = rs.head.getAs[Int]("total_chunks")
      assert(rs.length == total)
      assert(rs.map(_.getAs[Int]("chunk_index")).toSeq == (0 until total))
      rs.foreach { r =>
        assert(r.getAs[Int]("chunk_size_chars") == r.getAs[String]("text").length)
        assert(r.getAs[String]("chunk_id").length == 12)
      }
    }
    // plan must not contain a shuffle (Exchange)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunk explode must be shuffle-free:\n$plan")
  }

  test("chunk_id matches the reference construction (C17)") {
    import spark.implicits._
    val text = "some chunk content that is at least fifty characters long for the prefix"
    val df = Seq(("s1", 2, text)).toDF("source", "idx", "text")
      .select(Chunker.chunkId(col("source"), col("idx"), col("text")).as("id"))
    val expected = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val bytes = md.digest(s"s1_2_${text.take(50)}".getBytes("UTF-8"))
      bytes.map("%02x".format(_)).mkString.take(12)
    }
    assert(df.as[String].head() == expected)
  }
}
