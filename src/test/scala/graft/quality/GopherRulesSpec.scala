package graft.quality

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class GopherRulesSpec extends SparkTestBase {

  private def rulesOf(text: String) = {
    import spark.implicits._
    GopherRules.withGopherRules(Seq((1L, text)).toDF("doc_id", "text"), "text")
      .select("n_words", "mean_word_len", "symbol_word_ratio", "bullet_frac",
        "ellipsis_frac", "alpha_word_frac", "dup_line_frac", "keep")
      .head()
  }

  private val CleanDoc =
    (1 to 30).map(i => s"plain word${i % 7} here").mkString(" ") // 90 words, all alpha

  test("clean prose keeps; each rule violation flips keep independently") {
    assert(rulesOf(CleanDoc).getAs[Boolean]("keep"))

    // too few words
    assert(!rulesOf("just five short words here").getAs[Boolean]("keep"))
    // mean word length too long
    val longWords = (1 to 30).map(_ => "extraordinarilyprotracted").mkString(" ")
    assert(!rulesOf(longWords).getAs[Boolean]("keep"))
    // symbol density: a '#' per word
    val hashy = (1 to 30).map(i => s"#tag$i word").mkString(" ")
    assert(!rulesOf(hashy).getAs[Boolean]("keep"))
    // bullet-dominated lines
    val bullets = (1 to 20).map(i => s"- item $i listed now").mkString("\n")
    val bRow = rulesOf(bullets)
    assert(bRow.getAs[Double]("bullet_frac") == 1.0 && !bRow.getAs[Boolean]("keep"))
    // ellipsis-terminated lines
    val ell = (1 to 20).map(i => s"line $i trails off...").mkString("\n")
    val eRow = rulesOf(ell)
    assert(eRow.getAs[Double]("ellipsis_frac") == 1.0 && !eRow.getAs[Boolean]("keep"))
    // non-alphabetic words
    val digits = (1 to 30).map(i => s"$i ${i * 7} ok").mkString(" ")
    assert(!rulesOf(digits).getAs[Boolean]("keep"))
    // duplicate lines
    val dup = ("repeated line of text\n" * 10) + CleanDoc
    val dRow = rulesOf(dup)
    assert(dRow.getAs[Double]("dup_line_frac") > 0.3 && !dRow.getAs[Boolean]("keep"))
  }

  test("metric arithmetic on a hand-computed doc") {
    val r = rulesOf("alpha beta\n- bullet\nalpha beta\ntail word goes on...")
    // words: alpha beta - bullet alpha beta tail word goes on... = 10
    assert(r.getAs[Int]("n_words") == 10)
    // lines: 4; one bullet; one ellipsis-ended; one duplicate ("alpha beta")
    assert(r.getAs[Double]("bullet_frac") == 0.25)
    assert(r.getAs[Double]("ellipsis_frac") == 0.25)
    assert(r.getAs[Double]("dup_line_frac") == 0.25)
    // '...' counts into the symbol ratio: 1 ellipsis / 10 words
    assert(r.getAs[Double]("symbol_word_ratio") == 0.1)
    // '-' is a word without an alphabetic char → 9/10 alpha
    assert(r.getAs[Double]("alpha_word_frac") == 0.9)
  }

  test("empty and null text never keep, never divide by zero") {
    import spark.implicits._
    val out = GopherRules
      .withGopherRules(Seq((1L, ""), (2L, null: String)).toDF("doc_id", "text"), "text")
      .select("n_words", "mean_word_len", "keep").collect()
    out.foreach { r =>
      assert(r.getAs[Int]("n_words") == 0)
      assert(r.getAs[Double]("mean_word_len") == 0.0)
      assert(!r.getAs[Boolean]("keep"))
    }
  }

  test("real corpus: battery runs single-pass and keeps a sane fraction") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val out = GopherRules.withGopherRules(docs, "text").cache()
    val n = out.count()
    val kept = out.filter(col("keep")).count()
    assert(n > 0 && kept > 0 && kept < n,
      s"degenerate keep column: $kept of $n — thresholds grade nothing")
    out.unpersist()
  }

  private def fullOf(text: String) = {
    import spark.implicits._
    GopherRules.withGopherKeep(Seq((1L, text)).toDF("doc_id", "text"), "text")
      .select("keep_structural", "keep_repetition", "stopword_hits", "keep")
      .head()
  }

  // CleanDoc repeats a 3-word template (fails the repetition family by
  // construction) — the composed tests need genuinely non-repetitive
  // prose with no stop words, plus a tail carrying exactly two
  private val ProseDoc =
    (1 to 30).map(i => s"alpha$i bravo$i charlie$i").mkString(" ")
  private val StopTail = " the results go with care"

  test("withGopherKeep: composed verdict is the AND of all three families") {
    val good = fullOf(ProseDoc + StopTail)
    assert(good.getAs[Boolean]("keep_structural"))
    assert(good.getAs[Boolean]("keep_repetition"))
    assert(good.getAs[Int]("stopword_hits") == 2)
    assert(good.getAs[Boolean]("keep"))

    // stop-word rule alone flips keep: structurally clean, not repetitive,
    // but only one distinct stop word
    val oneStop = fullOf(ProseDoc + " the results")
    assert(oneStop.getAs[Boolean]("keep_structural"))
    assert(oneStop.getAs[Boolean]("keep_repetition"))
    assert(oneStop.getAs[Int]("stopword_hits") == 1)
    assert(!oneStop.getAs[Boolean]("keep"))

    // repetition alone flips keep: one 5-gram repeated past the 0.15
    // char-fraction threshold, word count and shape still in range
    val phrase = "solar panels convert light energy"
    val repetitive =
      ((1 to 8).map(_ => phrase) ++ (1 to 22).map(i => s"unique filler word$i next")).mkString(" ") + StopTail
    val rep = fullOf(repetitive)
    assert(rep.getAs[Boolean]("keep_structural"))
    assert(!rep.getAs[Boolean]("keep_repetition"))
    assert(!rep.getAs[Boolean]("keep"))

    // structural alone flips keep (word count below the floor)
    val short = fullOf("too short to keep but the words go with the flow")
    assert(!short.getAs[Boolean]("keep_structural"))
    assert(short.getAs[Int]("stopword_hits") >= 2)
    assert(!short.getAs[Boolean]("keep"))
  }

  test("stopwordHits counts DISTINCT published stop words, lowercased") {
    import spark.implicits._
    val hits = Seq(
      (1L, "The THE the and AND"),        // 2 distinct despite 5 hits
      (2L, "the be to of and that have with extra"), // all 8
      (3L, "them andes tothe"),           // substrings don't count
      (4L, null: String)
    ).toDF("doc_id", "text")
      .select(col("doc_id"), GopherRules.stopwordHits(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(hits == Map(1L -> 2, 2L -> 8, 3L -> 0, 4L -> 0))
  }

  test("keepByRepetitionFull: top-3-gram and dup-line-char thresholds participate") {
    import spark.implicits._
    // a doc whose top 3-gram char fraction exceeds 0.18 while top-2 ≤ 0.20
    // and dup-5 ≤ 0.15: repeat a 3-token phrase with a UNIQUE separator
    // pair between repeats (adjacent repeats would leak into dup-5-grams)
    val tri = "alpha beta gamma"
    val doc = ((1 to 6).flatMap(i => Seq(tri, s"sep$i uniq$i"))
      ++ (1 to 40).map(i => s"w$i x$i")).mkString(" ")
    val f = graft.text.RepetitionStats.repetitionFeatures(col("text"))
    val row = Seq((1L, doc)).toDF("doc_id", "text")
      .select(f.as("f"))
      .select(
        col("f.top2gram_char_frac").as("t2"), col("f.top3gram_char_frac").as("t3"),
        col("f.dup5gram_char_frac").as("d5"),
        graft.text.RepetitionStats.keepByRepetition(col("f")).as("old"),
        graft.text.RepetitionStats.keepByRepetitionFull(col("f")).as("full"))
      .head()
    assert(row.getAs[Double]("t3") > 0.18, s"construction: t3=${row.getAs[Double]("t3")}")
    assert(row.getAs[Boolean]("old"), "three-term verdict must miss this doc")
    assert(!row.getAs[Boolean]("full"), "full verdict must catch the top-3-gram run")
  }
}
