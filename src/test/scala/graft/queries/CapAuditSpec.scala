package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Capped-slice audit (r18, companion to [[RoundingAuditSpec]]'s
  * source-scan discipline): `QueryCatalog.cappedQueries` — the set
  * Bench stamps into every artifact as `capped_queries` so decade
  * readers can't mistake a fixed-density capped timing for full-corpus
  * linearity (ADVICE r14 #1) — must equal the set of catalog queries
  * whose NON-COMMENT body actually slices on a graded-slice cap.
  *
  * Why this is load-bearing: the set was hand-maintained next to the
  * queries, and it drifted — q_semantic_dedup had sliced on
  * `vec_id < Replica0CapSmall` since its cap landed while every BENCH
  * artifact labeled it uncapped (caught by the scan this spec pins).
  * A drifted entry silently corrupts exactly the ladder-reading this
  * annotation exists to protect.
  *
  * The audit is a source scan, like the rounding audit: the property
  * is about SOURCE IDIOMS. The cap family is syntactically
  * recognizable by contract — every graded-slice cap uses one of the
  * named `Replica0Cap*` constants or the events-side `< 100000L`
  * replica-0 literal (q_prefix_jaccard's bare `< 500` was renamed
  * Replica0CapTiny for exactly this reason); a bare numeric id filter
  * is a SEMANTIC predicate (planted pivots, top-k ids), not a cap,
  * and must stay un-matchable here.
  */
class CapAuditSpec extends AnyFunSuite {

  private val catalogPath =
    java.nio.file.Paths.get("src/main/scala/graft/queries/QueryCatalog.scala")

  /** `< Replica0Cap` / `< Replica0CapSmall` / `< Replica0CapTiny` in
    * Column filters, plus the events replica-0 literal (the sf0.1
    * events corpus = event_id < 100000 at every decade). The SQL-side
    * `$Replica0Cap*` interpolations live in the `*Sql` vals, which are
    * not Q blocks — the oracle side slicing identically is what the
    * driver's own row-grading enforces, so the scan pins the Spark
    * side only.
    */
  private val capIdiom =
    raw"< Replica0Cap\b|< Replica0CapSmall\b|< Replica0CapTiny\b|< 100000L".r

  test("cappedQueries equals the set of Q blocks whose code slices on a cap") {
    assert(java.nio.file.Files.isRegularFile(catalogPath),
      s"audit must run from the repo root (cwd=${new java.io.File(".").getCanonicalPath})")
    val src = new String(java.nio.file.Files.readAllBytes(catalogPath), "UTF-8")

    // registration pairs: "q_name" -> qValName; the oracleSql map
    // registers the same names against *Sql vals — exclude those so
    // each query name maps to its Q val
    val reg = raw""""(q[a-z0-9_]*)"\s*->\s*(q[A-Za-z0-9]+)\b""".r
      .findAllMatchIn(src)
      .collect { case m if !m.group(2).endsWith("Sql") => m.group(2) -> m.group(1) }
      .toMap
    assert(reg.size >= 100, s"registration parse collapsed (${reg.size} pairs) — scan broke")

    // top-level Q-val blocks; a block's scaladoc belongs to the
    // FOLLOWING val, so comment lines are stripped before matching —
    // without this, a capped query's doc comment classifies its
    // PREDECESSOR (the q_ivf_rewrite false positive the prototype hit).
    // A block ends at the next top-level declaration of ANY kind
    // (ADVICE r18): ending only at the next `: Q =` head would
    // attribute an interleaved helper (a *Sql string val, a private
    // def) to the preceding Q block, so a cap idiom in such a helper
    // would classify the wrong query as capped.
    val anyVal = raw"(?m)^  (?:private )?(?:lazy )?(?:val|def|var|object) [A-Za-z0-9_]+".r
      .findAllMatchIn(src).map(_.start).toVector
    val heads = raw"(?m)^  val (q[A-Za-z0-9]+): Q =".r.findAllMatchIn(src).toSeq
    assert(heads.size >= 100, s"found only ${heads.size} Q blocks — scan broke")
    val derived = heads.flatMap { m =>
      val end = anyVal.find(_ > m.start).getOrElse(src.length)
      val code = src.substring(m.start, end).linesIterator
        .filterNot { l =>
          val t = l.trim
          t.startsWith("//") || t.startsWith("*") || t.startsWith("/*")
        }
        // also drop trailing `// …` tails so an inline comment
        // MENTIONING a cap idiom can't classify its code line (r18
        // review). The split assumes no Q-block code line carries "//"
        // INSIDE a string literal — asserted loudly (ADVICE r18)
        // rather than relied on: an odd count of unescaped quotes
        // before the "//" means the split point sat inside an open
        // literal and real code would be truncated from the scan.
        .map { l =>
          val idx = l.indexOf("//")
          if (idx < 0) l
          else {
            val prefix = l.substring(0, idx)
            val unescapedQuotes = raw"""(?<!\\)"""".r.findAllIn(prefix).size
            assert(unescapedQuotes % 2 == 0,
              s"Q-block line carries // inside a string literal — the comment-strip " +
                s"would truncate real code before the cap scan: $l")
            prefix
          }
        }
      if (code.exists(l => capIdiom.findFirstIn(l).isDefined)) {
        val q = reg.get(m.group(1))
        assert(q.isDefined, s"capped val ${m.group(1)} is not in the queries map")
        q
      } else None
    }.toSet

    val declared = QueryCatalog.cappedQueries
    val missing = derived -- declared   // capped in code, unlabeled in artifacts
    val stale = declared -- derived     // labeled capped, no cap site found
    assert(missing.isEmpty && stale.isEmpty,
      "cappedQueries drifted from the actual cap sites — a capped row " +
        "must be listed (or a delisted row un-capped) in the same " +
        s"change:\n  capped-but-unlisted: ${missing.toSeq.sorted.mkString(", ")}" +
        s"\n  listed-but-uncapped: ${stale.toSeq.sorted.mkString(", ")}")

    info(s"${derived.size} capped queries, set and source agree")
  }
}
