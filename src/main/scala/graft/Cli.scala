package graft

import graft.chunk.Chunker
import graft.clean.TextCleaner
import graft.dedup.Dedup
import graft.embed.{Embedders, HashEmbedder}
import graft.lang.LanguageDetect
import graft.model.ChunkerConfig
import graft.quality.QualityMonitor
import graft.search.SearchFacade
import graft.sources.{HtmlLoader, HwpLoader}
import graft.store.VectorStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage runner — the reference CLI's surface (main.py:466-559:
  * extract / transform / load / validate / search / reset / all) on
  * Spark, with parquet checkpoints where the reference pickles
  * (S9). A reference user's `python main.py --stage all` becomes
  * `runMain graft.Cli all --input <docs dir> --work <dir>`.
  *
  * Usage:
  *   graft.Cli <stage> [--input DIR] [--work DIR] [--query TEXT]
  *             [--collection NAME] [--k N] [--source html|hwp|hwpx]
  */
object Cli {

  final case class Args(
      stage: String,
      input: String = "",
      work: String = "/tmp/graft-work",
      query: String = "",
      collection: String = "",
      k: Int = 3,
      source: String = "html"
  )

  private[graft] def parse(argv: Array[String]): Args = {
    require(argv.nonEmpty, "stage required: extract|transform|load|validate|search|reset|all")
    var a = Args(stage = argv.head)
    var i = 1
    while (i < argv.length) {
      argv(i) match {
        case "--input" => a = a.copy(input = argv(i + 1)); i += 2
        case "--work" => a = a.copy(work = argv(i + 1)); i += 2
        case "--query" => a = a.copy(query = argv(i + 1)); i += 2
        case "--collection" => a = a.copy(collection = argv(i + 1)); i += 2
        case "--k" => a = a.copy(k = argv(i + 1).toInt); i += 2
        case "--source" => a = a.copy(source = argv(i + 1)); i += 2
        case other => throw new IllegalArgumentException(s"unknown flag $other")
      }
    }
    a
  }

  private def documentsPath(a: Args) = s"${a.work}/documents"
  private def chunksPath(a: Args) = s"${a.work}/chunks"
  private def storePath(a: Args) = s"${a.work}/store"

  def extract(spark: SparkSession, a: Args): DataFrame = {
    val docs = a.source match {
      case "html" => HtmlLoader.load(spark, a.input)
      case "hwp" => HwpLoader.loadHwp(spark, a.input)
      case "hwpx" => HwpLoader.loadHwpx(spark, a.input)
      case other => throw new IllegalArgumentException(s"unknown source $other")
    }
    docs.write.mode("overwrite").parquet(documentsPath(a))
    spark.read.parquet(documentsPath(a))
  }

  def transform(spark: SparkSession, a: Args): DataFrame = {
    val docs = spark.read.parquet(documentsPath(a))
    val chunks = Chunker.explodeChunks(docs, "text", "source", ChunkerConfig.default)
    val deduped = Dedup.exactDedup(chunks, "text", Seq("source", "chunk_index"))
    deduped.write.mode("overwrite").parquet(chunksPath(a))
    spark.read.parquet(chunksPath(a))
  }

  def load(spark: SparkSession, a: Args): DataFrame = {
    val chunks = spark.read.parquet(chunksPath(a))
    val embedded = Embedders.withEmbedding(chunks, "text", "embedding", Embedders.default)
    val folderCol = if (embedded.columns.contains("folder_name")) "folder_name" else "language"
    new VectorStore(storePath(a)).writePartitioned(embedded, folderCol, "docs_")
    spark.read.parquet(storePath(a))
  }

  def validate(spark: SparkSession, a: Args): DataFrame = {
    val store = spark.read.parquet(storePath(a))
    val report = QualityMonitor.report(store, "chunk_size_tokens")
    report.show(truncate = false)
    report
  }

  def search(spark: SparkSession, a: Args): DataFrame = {
    val all = spark.read.parquet(storePath(a))
    val scoped =
      if (a.collection.nonEmpty) all.filter(col("collection") === a.collection) else all
    val results = SearchFacade.search(scoped, a.query, Embedders.default, a.k)
    results.show(truncate = false)
    results
  }

  def reset(a: Args): Unit = {
    new VectorStore(storePath(a)).dropAll()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(documentsPath(a)))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(chunksPath(a)))
  }

  def run(spark: SparkSession, a: Args): Unit = a.stage match {
    case "extract" => extract(spark, a)
    case "transform" => transform(spark, a)
    case "load" => load(spark, a)
    case "validate" => validate(spark, a)
    case "search" => search(spark, a)
    case "reset" => reset(a)
    case "all" =>
      extract(spark, a); transform(spark, a); load(spark, a); validate(spark, a)
    case other => throw new IllegalArgumentException(s"unknown stage $other")
  }

  def main(argv: Array[String]): Unit = {
    val a = parse(argv)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .appName(s"graft-${a.stage}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, a)
    finally spark.stop()
  }
}
