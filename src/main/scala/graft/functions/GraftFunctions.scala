package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql("SELECT dot_product(a, b) ...")` works alongside the
  * Column API. Two entry points:
  *
  *  - [[GraftFunctions.registerAll]] — imperative, for an existing
  *    session (tests, notebooks).
  *  - [[GraftExtensions]] — declarative, via
  *    `spark.sql.extensions=graft.functions.GraftExtensions` at
  *    session build time (the deployment path).
  */
object GraftFunctions {

  import org.apache.spark.sql.{Column, GraftBridge}

  /** Lift a Column-level function into a FunctionRegistry builder: the
    * Column composition is resolved to one Expression tree at parse
    * time, so the SQL form plans and codegens exactly like the Column
    * API call it wraps.
    */
  private def wrap1(name: String)(f: Column => Column): Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 1, s"$name expects 1 argument, got ${exprs.length}")
    GraftBridge.expression(f(GraftBridge.column(exprs.head)))
  }

  private def wrap2(name: String)(f: (Column, Column) => Column): Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"$name expects 2 arguments, got ${exprs.length}")
    GraftBridge.expression(f(GraftBridge.column(exprs(0)), GraftBridge.column(exprs(1))))
  }

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> { exprs => DotProduct(exprs(0), exprs(1)) },
    "cosine_sim" -> wrap2("cosine_sim")(VectorFunctions.cosineSimilarity),
    "graft_clean_text" -> wrap1("graft_clean_text")(graft.clean.TextCleaner.cleanText),
    "graft_clean_hwp" -> wrap1("graft_clean_hwp")(graft.clean.TextCleaner.cleanHwpText),
    "detect_language" -> wrap1("detect_language")(graft.lang.LanguageDetect.detectContentLanguage),
    "estimate_tokens" -> wrap1("estimate_tokens")(graft.lang.LanguageDetect.estimateTokens),
    "token_count_bpeish" -> wrap1("token_count_bpeish")(graft.text.TextAnalysis.tokenCountBpeish),
    "quality_score" -> wrap1("quality_score")(graft.text.TextAnalysis.qualityScore),
    "langid_ngram" -> wrap1("langid_ngram")(graft.text.TextAnalysis.languageIdNgram),
    "fingerprint64" -> wrap1("fingerprint64")(graft.text.TextAnalysis.fingerprint64),
    // The UDAF rides the same builder table: GraftBridge.aggregatorBuilder
    // plants the ScalaAggregator expression spark.udf.register would, so
    // the extensions path and registerAll expose an identical surface.
    "vector_mean" -> {
      val b = GraftBridge.aggregatorBuilder(
        org.apache.spark.sql.functions.udaf(VectorMeanAggregator))
      exprs => {
        require(exprs.length == 1, s"vector_mean expects 1 argument, got ${exprs.length}")
        b(exprs)
      }
    }
  )

  /** Names of every SQL function the surface registers. */
  val names: Seq[String] = functions.map(_._1)

  /** Registers every SQL function above, `vector_mean` UDAF included. */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      GraftBridge.registerFunction(spark, name, builder)
    }

  /** Undo [[registerAll]]: drop every temp-function entry it created. */
  def unregisterAll(spark: SparkSession): Unit =
    names.foreach(GraftBridge.dropFunction(spark, _))

  /** Register the surface, run `body`, then drop ONLY the names that
    * were absent beforehand. On a session built with
    * `spark.sql.extensions=GraftExtensions` every name pre-exists, so
    * the cleanup is a no-op and the live session keeps its functions —
    * an unconditional [[unregisterAll]] there would permanently strip
    * the deployed surface (and race any concurrent catalog query).
    */
  def withRegistered[T](spark: SparkSession)(body: => T): T = {
    val preExisting = names.filter(spark.catalog.functionExists).toSet
    registerAll(spark)
    try body
    finally names.filterNot(preExisting).foreach(GraftBridge.dropFunction(spark, _))
  }

  private[functions] def inject(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      ext.injectFunction(
        (
          FunctionIdentifier(name),
          new ExpressionInfo("graft.functions.DotProduct", name),
          builder
        )
      )
    }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` —
  * SQL functions + the IVF top-k pruning rewrite (which stays inert
  * until a collection is registered in [[graft.plans.IvfCatalog]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(ext)
    ext.injectOptimizerRule(_ => graft.plans.IvfTopKPrune)
  }
}
