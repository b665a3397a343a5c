package graft.lang

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** FIXTURES.md §4 — the two detectors diverge by design; both variants
  * pinned here.
  */
class LanguageDetectSpec extends SparkTestBase {
  import org.apache.spark.sql.DataFrame

  private def detect(texts: Seq[String], f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[String] = {
    import spark.implicits._
    texts.toDF("t").select(f(col("t")).as("l")).as[String].collect().toSeq
  }

  test("empty defaults diverge: content→korean, query→english") {
    assert(detect(Seq(""), LanguageDetect.detectContentLanguage) == Seq("korean"))
    assert(detect(Seq(""), LanguageDetect.detectQueryLanguage) == Seq("english"))
  }

  test("hangul above 10% → korean in both") {
    val t = "한글이 충분히 많은 텍스트 with some english"
    assert(detect(Seq(t), LanguageDetect.detectContentLanguage) == Seq("korean"))
    assert(detect(Seq(t), LanguageDetect.detectQueryLanguage) == Seq("korean"))
  }

  test("vietnamese threshold diverges: 3% diacritics → viet(content) / english(query)") {
    // 3 viet chars in 100 chars: content threshold 2% fires, query 5% does not
    val base = "a" * 97
    val t = base + "ăâđ"
    assert(detect(Seq(t), LanguageDetect.detectContentLanguage) == Seq("vietnamese"))
    assert(detect(Seq(t), LanguageDetect.detectQueryLanguage) == Seq("english"))
  }

  test("6% viet diacritics → vietnamese in both") {
    val t = ("a" * 94) + "ăâđêôơ"
    assert(detect(Seq(t), LanguageDetect.detectContentLanguage) == Seq("vietnamese"))
    assert(detect(Seq(t), LanguageDetect.detectQueryLanguage) == Seq("vietnamese"))
  }

  test("35% ascii letters → english in both") {
    val t = "abcdefghijklmnopqrstuvwxyzabcdefghi " + ("1234567890 " * 6) // ~35 letters / 100 chars
    assert(detect(Seq(t), LanguageDetect.detectContentLanguage) == Seq("english"))
    assert(detect(Seq(t), LanguageDetect.detectQueryLanguage) == Seq("english"))
  }

  test("below all thresholds: content argmax, query defaults english") {
    // 5 hangul, 3 letters in 100 chars → argmax korean (content)
    val t = "한국어다섯 " + "abc " + ("1234567890" * 9)
    assert(detect(Seq(t), LanguageDetect.detectContentLanguage) == Seq("korean"))
    assert(detect(Seq(t), LanguageDetect.detectQueryLanguage) == Seq("english"))
  }

  test("token estimation (C16)") {
    import spark.implicits._
    val df = Seq("한글넷자다", "abcdefgh", "한글 and ascii").toDF("t")
      .select(LanguageDetect.estimateTokens(col("t")).as("n"))
    val got = df.as[Int].collect().toSeq
    // "한글넷자다": 5 hangul → floor(5/1.5)=3 ; "abcdefgh": floor(8/4)=2
    // "한글 and ascii": 2 hangul, 10 other → floor(1.333+2.5)=3
    assert(got == Seq(3, 2, 3))
  }
}
