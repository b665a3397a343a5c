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

  private val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_product" -> { exprs => DotProduct(exprs(0), exprs(1)) }
  )

  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      GraftBridge.registerFunction(spark, name, builder)
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
