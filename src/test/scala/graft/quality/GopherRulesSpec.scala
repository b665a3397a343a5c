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
}
