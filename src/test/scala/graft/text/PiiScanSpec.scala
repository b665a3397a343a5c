package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import scala.util.Random

/** Differential parity of the candidate-gated scrubber against the
  * reference 4-stage replaceAll chain — the ONLY correctness contract
  * PiiScan has is "byte-identical to the engine on every input".
  */
class PiiScanSpec extends SparkTestBase {

  /** The reference: the exact pattern-major chain scrubBatched used
    * before gating (and what the DuckDB oracle replays in RE2).
    */
  private def reference(s: String): String =
    PiiScrub.Stages.foldLeft(s) { case (acc, (p, r)) =>
      java.util.regex.Pattern.compile(p).matcher(acc).replaceAll(r)
    }

  private def gated(s: String): String = new PiiScan.Scrubber().scrub(s)

  private def assertParity(s: String): Unit = {
    val want = reference(s)
    val got = gated(s)
    assert(got == want, s"\ninput: ${s.take(200)}\nwant : $want\ngot  : $got")
  }

  test("targeted edge cases: guard consumption, $-before-final-newline, adjacency") {
    Seq(
      "", "@", "@@", "a@", "@a", "a@b", "a@b.co",
      "a@b@c.com",                         // failed '@' then a later good one
      "x@y.comz@w.net",                    // greedy TLD swallows into the next local part
      "x@y.com1a@b.de",                    // match ends at digit, next email right after
      "pay 1234-5678-9012-3456 thanks",
      "1234-5678-9012-3456",               // ^-anchored zero-width guard
      "1234567890123456",                  // unseparated PAN at position 0
      "12345678901234567890",              // 20-digit run: no match anywhere
      "1111222233334444 5555666677778888", // consumed trailing guard blocks the neighbor
      "1234-5678-9012-3456-7890",          // trailing 4-digit group + eaten '-'
      "1234-5678-9012-345678901 x",        // backtrack into a later start
      "card 1234123412341234\n",           // Java $ matches before the final newline
      "card 1234123412341234\r\n",
      "+82 10-1234-5678",                  // phone at position 0 via '+'
      "(02) 123-4567",                     // paren area code at position 0
      "82 10 1234 5678",
      "010.1234.5678 dots",
      "call 010 1234 5678 now or 010 8765 4321 later",
      "1.2.3.4", "1.2.3.4.5", "a 1.2.3.4.5 b", // IP guard excludes dots
      "v1.2.3 release",
      "ip 192.168.0.1\n",
      "mix a@b.co 1234 5678 9012 345 +82 10-1234-5678 10.0.0.1 end",
      "한글 텍스트 010-1234-5678 속의 전화번호",
      "no pii at all, plain prose only"
    ).foreach(assertParity)
  }

  test("randomized digit-soup parity (5000 cases)") {
    val rnd = new Random(0x9115L)
    val atoms = Array(
      "1", "12", "123", "1234", "12345", "1234567", "12345678",
      "-", " ", ".", "+", "(", ")", "@", "a", "ab", "abc", "com", "co",
      "x.y", "_", "%", "\n", "한", "글 ", "e@f.gh", "9.9.9.9",
      "1234-5678-9012-3456", "010 1234 5678"
    )
    (1 to 5000).foreach { _ =>
      val n = 1 + rnd.nextInt(14)
      val s = (1 to n).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
      assertParity(s)
    }
  }

  test("real-corpus parity with the bench noise suffix (sf0.001)") {
    val noise =
      " contact john.doe@example.com or +82 10-1234-5678 backup 010 1234 5678 ip 192.168.0.1 card 1234-5678-9012-3456 done"
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("text")).collect().map(_.getString(0) + noise)
    val scr = new PiiScan.Scrubber()
    docs.foreach { d => assert(scr.scrub(d) == reference(d)) }
  }

  test("scrubber instance is reusable across many strings (no state bleed)") {
    val scr = new PiiScan.Scrubber()
    val inputs = Seq(
      "a@b.co then 1234 5678 9012 3456",
      "nothing here",
      "192.168.0.1 and 010-1234-5678"
    )
    // twice through the same instance must equal fresh-instance output
    (inputs ++ inputs).foreach { s =>
      assert(scr.scrub(s) == gated(s))
    }
  }
}
