package graft.functions

import graft.SparkTestBase
import graft.clean.TextCleaner
import org.apache.spark.sql.functions._

class RegexChainSpec extends SparkTestBase {

  test("RegexChain == left fold of regexp_replace over the same stages (battery parity)") {
    import spark.implicits._
    val samples = Seq(
      "<div class='x'> plain words here </div> {{#t}}x{{/t}} http://a.com Copyright 2024",
      "  leading  and   trailing   ",
      "한글 텍스트 with MIXED content 123 {% if %} ${v} [[wiki]]",
      "",
      "line1\n\n\n\nline2\n  \nline3",
      "no-noise lowercase text that should survive unchanged"
    )
    val df = samples.toDF("text")
    val folded = TextCleaner.BatteryStages.foldLeft(col("text")) { case (acc, (p, r)) =>
      regexp_replace(acc, p, r)
    }
    val rows = df
      .select(
        RegexChain(col("text"), TextCleaner.BatteryStages).as("chain"),
        folded.as("fold")
      )
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("$n group references replace identically to regexp_replace (Matcher semantics)") {
    import spark.implicits._
    val stages = Seq(
      "([a-z]+)-([0-9]+)" -> "$2:$1",          // swap via group refs
      "(^|[^0-9])([0-9]{2})x" -> "$1<N$2>"      // guard-class recapture, PiiScrub shape
    )
    val samples = Seq("abc-123 and def-9", "42x edge 7 99x", "", "no digits here")
    val df = samples.toDF("text")
    val folded = stages.foldLeft(col("text")) { case (acc, (p, r)) => regexp_replace(acc, p, r) }
    val rows = df.select(RegexChain(col("text"), stages).as("chain"), folded.as("fold")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("RegexChain stays inside whole-stage codegen where the nested fold cannot") {
    // spark.range gives a real (non-local) scan so the projection isn't
    // constant-folded into a LocalTableScan before planning
    val df = spark.range(4)
      .select(RegexChain(concat(lit("text <b>x</b> n"), col("id").cast("string")), TextCleaner.BatteryStages).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd stages render as "*(n) Project ..." in the plan string
    assert(plan.contains("*(1) Project"), s"expected codegen in:\n$plan")
    assert(df.collect().forall(_.getString(0).nonEmpty))
  }

  test("fast char-class stages ≡ Matcher.replaceAll, exhaustively over the BMP") {
    // every battery stage of a fast-eligible shape, applied to every
    // single-char BMP string, must agree with the regex engine — this is
    // the per-code-point contract the probe-built tables rely on
    val fastShaped = TextCleaner.BatteryStages.filter { case (p, r) =>
      !r.contains("$") && !r.contains("\\") &&
        p.matches("""^(\(\?U\))?\[([^\]\\]|\\.)+\](\+|\\s\*)?$""")
    }
    assert(fastShaped.size >= 9, s"expected the profiled hot stages to be fast-shaped, got ${fastShaped.size}")
    fastShaped.foreach { case (p, r) =>
      val stage = RegexChain.compileStage(p, r)
      val pat = java.util.regex.Pattern.compile(p)
      var cp = 0
      while (cp < 0x10000) {
        if (!Character.isSurrogate(cp.toChar)) {
          val s = String.valueOf(cp.toChar)
          val got = stage(s)
          val want = pat.matcher(s).replaceAll(r)
          assert(got == want, s"stage '$p' diverges on U+${cp.toHexString}: '$got' vs '$want'")
        }
        cp += 1
      }
    }
  }

  test("fast stages ≡ regex on run/boundary/supplementary adversarial strings") {
    val adversarial = Seq(
      "가나다", "가 나\t다", "  \t ", "a가b나c", "™™™", "a™ b", // runs + ws tails
      "😀😀 mixed 😀", // emoji pairs (SMP)
      "\uD800 lone surrogate", "페이지 끝 \n\n 다음", "", " ", "\n",
      "ABC DEF 헥사 123 !@# ~`| ™†·"
    )
    TextCleaner.BatteryStages.foreach { case (p, r) =>
      val stage = RegexChain.compileStage(p, r)
      val pat = java.util.regex.Pattern.compile(p)
      adversarial.foreach { s =>
        assert(stage(s) == pat.matcher(s).replaceAll(r),
          s"stage '$p' diverges on '${s.take(30)}'")
      }
    }
  }

  test("fast stages ≡ regex on deterministic fuzz incl. astral + lone surrogates") {
    // The BMP is pinned exhaustively and the adversarial set pins the
    // known edge shapes; this closes the remaining gap — arbitrary
    // MIXTURES of BMP classes, supplementary code points (lazy memo
    // path), and malformed UTF-16 (lone surrogates mid-string), where
    // a code-unit-vs-code-point iteration bug would hide. Fixed-seed
    // LCG, so the corpus is reproducible — a failure names its string.
    var seed = 0x5DEECE66DL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    val pools: Array[Int => Int] = Array(
      _ => 'a' + nextInt(26),                    // ASCII letters
      _ => nextInt(0x20),                        // control chars
      _ => ' ',
      _ => 0xAC00 + nextInt(11172),              // Hangul syllables
      _ => 0x2000 + nextInt(0x100),              // punctuation/symbol block
      _ => 0x1F600 + nextInt(80),                // emoji (SMP, surrogate pairs)
      _ => 0x10000 + nextInt(0x1000),            // other supplementary
      _ => 0xD800 + nextInt(0x800)               // raw surrogate code UNITS
    )
    val corpus = (0 until 600).map { _ =>
      val len = nextInt(24)
      val sb = new java.lang.StringBuilder
      (0 until len).foreach { _ =>
        val cp = pools(nextInt(pools.length))(0)
        if (cp >= 0xD800 && cp < 0xE000) sb.append(cp.toChar) // keep lone units lone
        else sb.appendCodePoint(cp)
      }
      sb.toString
    }
    TextCleaner.BatteryStages.foreach { case (p, r) =>
      val stage = RegexChain.compileStage(p, r)
      val pat = java.util.regex.Pattern.compile(p)
      corpus.foreach { s =>
        assert(stage(s) == pat.matcher(s).replaceAll(r),
          s"stage '$p' diverges on ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
      }
    }
  }

  test("null input stays null; cleanText coalesces to empty string") {
    import spark.implicits._
    val df = Seq[Option[String]](None, Some("x")).toDF("text")
    val got = df.select(
      RegexChain(col("text"), TextCleaner.BatteryStages).as("raw"),
      TextCleaner.cleanText(col("text")).as("clean")
    ).collect()
    assert(got(0).isNullAt(0) && got(0).getString(1) == "")
    assert(got(1).getString(0) == "x" && got(1).getString(1) == "x")
  }
}
