package graft

import java.nio.file.{Files, Paths}

/** End-to-end stage runner over a real HTML directory — the reference
  * user's `--stage all` path (main.py:466-559 parity).
  */
class CliSpec extends SparkTestBase {

  test("extract → transform → load → validate → search → reset over an HTML corpus") {
    val input = Files.createTempDirectory("graft-cli-in").toString
    val work = Files.createTempDirectory("graft-cli-work").toString
    Files.createDirectories(Paths.get(s"$input/guides"))
    (1 to 5).foreach { i =>
      val body = (1 to 30)
        .map(j => s"<p>Guide $i paragraph $j about spark joins and aggregation pipelines.</p>")
        .mkString
      Files.write(
        Paths.get(s"$input/guides/g$i.html"),
        s"<html><head><title>Guide $i</title></head><body>$body</body></html>".getBytes("UTF-8")
      )
    }

    Cli.run(spark, Cli.parse(Array("extract", "--input", input, "--work", work)))
    assert(spark.read.parquet(s"$work/documents").count() == 5)

    Cli.run(spark, Cli.parse(Array("transform", "--work", work)))
    val chunks = spark.read.parquet(s"$work/chunks")
    assert(chunks.count() > 5) // long docs → multiple chunks each
    assert(chunks.columns.contains("chunk_id"))

    Cli.run(spark, Cli.parse(Array("load", "--work", work)))
    val store = spark.read.parquet(s"$work/store")
    assert(store.columns.contains("embedding"))
    assert(store.select("collection").distinct().count() == 1) // guides folder

    val report = Cli.validate(spark, Cli.parse(Array("validate", "--work", work)))
    assert(report.columns.contains("recommendation"))

    val results = Cli.search(
      spark,
      Cli.parse(Array("search", "--work", work, "--query", "spark join aggregation", "--k", "3"))
    )
    assert(results.count() == 3)

    Cli.run(spark, Cli.parse(Array("reset", "--work", work)))
    assert(!new java.io.File(s"$work/store").exists())
  }

  test("extract → transform → load → search over a binary HWP corpus (--source hwp)") {
    val input = Files.createTempDirectory("graft-cli-hwp-in").toString
    val work = Files.createTempDirectory("graft-cli-hwp-work").toString
    Files.createDirectories(Paths.get(s"$input/notices"))
    (1 to 3).foreach { i =>
      val text = (1 to 20)
        .map(j => s"공지사항 $i 번째 문단 $j 스파크 조인과 집계 파이프라인에 대한 설명입니다.")
        .mkString(" ")
      Files.write(
        Paths.get(s"$input/notices/n$i.hwp"),
        graft.sources.HwpFixtures.buildHwpCfb(text, compressed = true)
      )
    }

    Cli.run(spark, Cli.parse(Array("extract", "--input", input, "--work", work, "--source", "hwp")))
    val docs = spark.read.parquet(s"$work/documents")
    assert(docs.count() == 3)
    assert(docs.select("language").distinct().collect().map(_.getString(0)).toSeq == Seq("korean"))

    Cli.run(spark, Cli.parse(Array("transform", "--work", work)))
    assert(spark.read.parquet(s"$work/chunks").count() >= 3)

    Cli.run(spark, Cli.parse(Array("load", "--work", work)))
    val store = spark.read.parquet(s"$work/store")
    assert(store.columns.contains("embedding"))

    val results = Cli.search(
      spark,
      Cli.parse(Array("search", "--work", work, "--query", "스파크 조인 집계", "--k", "2"))
    )
    assert(results.count() == 2)
  }

  test("unknown stage/flag rejected") {
    intercept[IllegalArgumentException](Cli.parse(Array("extract", "--bogus", "x")))
    intercept[IllegalArgumentException](
      Cli.run(spark, Cli.parse(Array("nope")))
    )
  }
}
