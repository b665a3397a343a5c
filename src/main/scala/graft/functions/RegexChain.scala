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

  // Resolved through the JVM-wide stage cache: expressions are
  // deserialized once per TASK, and rebuilding a CharClassStage's
  // probe table (65k regex matches) per task would cost more than the
  // table saves — per distinct (pattern, replacement) per executor JVM
  // is the right cadence.
  @transient private lazy val compiled: Array[RegexChain.CompiledStage] =
    stages.map(s => RegexChain.cachedStage(s.pattern, s.replacement)).toArray

  /** Called from both interpreted eval and generated code. */
  def run(input: UTF8String): UTF8String = {
    var cur = input.toString
    var i = 0
    while (i < compiled.length) {
      cur = compiled(i)(cur)
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

  // -----------------------------------------------------------------
  // Stage compilation: single-character-class stages take a direct
  // table-driven scan instead of the regex engine.
  //
  // Profiling the 45-stage cleaning battery showed ~75% of its CPU in
  // stages of three shapes — `[class]` (C2/C9 whitelists), `[class]+`
  // (C1 garbage runs, C7 emoji, C10 space runs), `[class]\s*` (C3's
  // Korean noise-syllable sets) — where java.util.regex scans every
  // input char against a large class. Those shapes are exactly
  // per-code-point membership plus a trivial quantifier, so they run
  // here as a single pass over the string with a BitSet lookup.
  //
  // Correctness is by construction, not by parsing: class membership
  // is decided by probing THE COMPILED PATTERN ITSELF with each BMP
  // code point once per executor (65,536 `matches()` calls, a few ms),
  // and supplementary code points probe lazily through a memo map. A
  // stage that doesn't fit the shape grammar — or whose replacement
  // carries `$`/`\` references — falls back to Matcher.replaceAll
  // unchanged. RegexChainSpec pins fast ≡ regex per stage shape and
  // exhaustively over the BMP.
  // -----------------------------------------------------------------

  private[functions] sealed trait CompiledStage {
    def apply(s: String): String
  }

  private final class SlowStage(p: java.util.regex.Pattern, rep: String) extends CompiledStage {
    def apply(s: String): String = p.matcher(s).replaceAll(rep)
  }

  // quantifier modes
  private final val Single = 0 // [class]       — one match per class char
  private final val RunCollapse = 1 // [class]+  — a whole run is one match
  private final val WsStar = 2 // [class]\s*     — class char swallows ASCII ws

  private final class CharClassStage(
      probe: java.util.regex.Pattern, // the class alone (incl. any (?U) flag)
      mode: Int,
      rep: String
  ) extends CompiledStage {

    private val bmp = new java.util.BitSet(0x10000)
    locally {
      var cp = 0
      while (cp < 0x10000) {
        if (probe.matcher(String.valueOf(cp.toChar)).matches()) bmp.set(cp)
        cp += 1
      }
    }
    private val supplementary =
      new java.util.concurrent.ConcurrentHashMap[Integer, java.lang.Boolean]()

    private def inClass(cp: Int): Boolean =
      if (cp < 0x10000) bmp.get(cp)
      else
        supplementary
          .computeIfAbsent(
            cp,
            c => java.lang.Boolean.valueOf(
              probe.matcher(new String(Character.toChars(c))).matches()))
          .booleanValue()

    // java.util.regex \s without UNICODE_CHARACTER_CLASS
    private def isAsciiWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

    def apply(s: String): String = {
      val n = s.length
      var i = 0
      var sb: java.lang.StringBuilder = null // allocated on first match only
      while (i < n) {
        val cp = s.codePointAt(i)
        val w = Character.charCount(cp)
        if (inClass(cp)) {
          if (sb == null) {
            sb = new java.lang.StringBuilder(n)
            sb.append(s, 0, i)
          }
          sb.append(rep)
          i += w
          if (mode == RunCollapse) {
            var go = true
            while (go && i < n) {
              val c2 = s.codePointAt(i)
              if (inClass(c2)) i += Character.charCount(c2) else go = false
            }
          } else if (mode == WsStar) {
            while (i < n && isAsciiWs(s.charAt(i))) i += 1
          }
        } else {
          if (sb != null) {
            if (w == 1) sb.append(s.charAt(i)) else sb.append(s, i, i + w)
          }
          i += w
        }
      }
      if (sb == null) s else sb.toString
    }
  }

  // Stages are stateless after construction (read-only BitSet, a
  // thread-safe memo map, thread-safe Pattern), so one instance per
  // distinct stage serves every task in the executor.
  private val stageCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), CompiledStage]()

  private[functions] def cachedStage(pattern: String, replacement: String): CompiledStage =
    stageCache.computeIfAbsent((pattern, replacement), { case (p, r) => compileStage(p, r) })

  // One character class — `[...]` with escaped or plain members — with
  // an optional leading (?U) flag and an optional `+` or `\s*` suffix.
  // `\s*` is only fast-handled WITHOUT (?U) (flagged \s is Unicode ws).
  private val FastShape =
    """^((\(\?U\))?\[(?:[^\]\\]|\\.)+\])(\+|\\s\*)?$""".r

  private[functions] def compileStage(pattern: String, replacement: String): CompiledStage = {
    val slow = () => new SlowStage(java.util.regex.Pattern.compile(pattern), replacement)
    // replacement must be literal: Matcher.replaceAll interprets $n and \
    if (replacement.contains('$') || replacement.contains('\\')) return slow()
    pattern match {
      case FastShape(cls, flag, suffix) =>
        val mode = suffix match {
          case null => Single
          case "+" => RunCollapse
          case "\\s*" if flag == null => WsStar
          case _ => return slow()
        }
        new CharClassStage(java.util.regex.Pattern.compile(cls), mode, replacement)
      case _ => slow()
    }
  }
}
