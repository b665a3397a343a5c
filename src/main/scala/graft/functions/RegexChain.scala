package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One stage of a [[RegexChain]]: a Java regex and its replacement,
  * applied with `Matcher.replaceAll` — identical semantics to a
  * `regexp_replace` call with the same arguments.
  */
final case class RegexStage(pattern: String, replacement: String)

/** A whole sequential regexp_replace battery as ONE Catalyst
  * expression.
  *
  * Why not a chain of built-in `regexp_replace`s: nesting N of them
  * builds one N-deep expression tree whose generated code cannot be
  * split into sub-methods (it is a single expression), so past a few
  * dozen stages the stage blows the 64 KB Janino method limit and the
  * WHOLE stage silently falls back to interpreted evaluation — measured
  * 4× slower on the 44-stage cleaning battery (each interpreted stage
  * also pays a UTF8String↔String round-trip per row). This expression
  * keeps the generated code at one method call, hoists pattern
  * compilation to one lazy array per executor, and materializes the
  * Java String once per row for all stages.
  *
  * Semantics are EXACTLY the left fold of `regexp_replace(…)` over the
  * stages (RegexChainSpec pins the equivalence). Replacement parsing —
  * `$n` group references and backslash escapes — follows
  * `java.util.regex.Matcher.replaceAll`, which is also what Spark's
  * `regexp_replace` uses, so group-referencing replacements (PiiScrub
  * passes `$1`/`$2`) behave identically on both paths (spec-pinned).
  */
case class RegexChain(child: Expression, stages: Seq[RegexStage]) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"regex_chain needs a string input, got ${child.dataType}")

  @transient private lazy val compiled: Array[java.util.regex.Pattern] =
    stages.map(s => java.util.regex.Pattern.compile(s.pattern)).toArray
  @transient private lazy val replacements: Array[String] = stages.map(_.replacement).toArray

  /** Called from both interpreted eval and generated code. */
  def run(input: UTF8String): UTF8String = {
    var cur = input.toString
    var i = 0
    while (i < compiled.length) {
      cur = compiled(i).matcher(cur).replaceAll(replacements(i))
      i += 1
    }
    UTF8String.fromString(cur)
  }

  override def nullSafeEval(input: Any): Any = run(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("regexChain", this, classOf[RegexChain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.run($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegexChain {
  /** Column form. */
  def apply(c: Column, stages: Seq[(String, String)]): Column =
    GraftBridge.column(
      RegexChain(GraftBridge.expression(c), stages.map { case (p, r) => RegexStage(p, r) })
    )
}
