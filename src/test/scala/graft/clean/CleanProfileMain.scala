package graft.clean

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness: times every battery stage with plain
  * java.util.regex (the same engine Catalyst's RegExpReplace uses) over
  * the real noisy-corpus input, so optimization work targets measured
  * cost instead of guesses. Run:
  *   sbt "Test/runMain graft.clean.CleanProfileMain [sfDir]"
  */
object CleanProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    spark.stop()
    val suffix = " </div> {{#head}}tpl{{/head}} {% if x %} ${var} " +
      "see https://example.com/abc?q=1 and www.test.com here " +
      "Copyright 2024 All Rights Reserved Page 3 of 7 " +
      "alpha = beta & gamma 페이지"
    var corpus = texts.map(t => "<div class='x'> " + t + suffix)
    println(s"docs=${corpus.length} avgLen=${corpus.map(_.length).sum / corpus.length}")

    val stages: Seq[(String, String, String)] =
      Seq(("C1-garbage", TextCleaner.HwpGarbagePattern, " "),
        ("C2-allowed", TextCleaner.AllowedCharsPattern, " ")) ++
        TextCleaner.HwpNoisePatterns.zipWithIndex.map { case (p, i) => (s"C3-$i", p, " ") } ++
        Seq(("C4-html", TextCleaner.HtmlTagPattern, " ")) ++
        TextCleaner.TemplateTagPatterns.zipWithIndex.map { case (p, i) => (s"C5-$i", "(?i)" + p, "") } ++
        TextCleaner.JsPatterns.zipWithIndex.map { case (p, i) => (s"C6-$i", "(?i)" + p, "") } ++
        Seq(("C7-emoji", TextCleaner.EmojiPattern, "")) ++
        TextCleaner.HeaderFooterPatterns.zipWithIndex.map { case (p, i) => (s"C8-$i", "(?im)" + p, "") } ++
        Seq(
          ("C9-special", TextCleaner.SpecialCharPattern, " "),
          ("C10-a", "[ \\t]+", " "),
          ("C10-b", "\\n\\s*\\n", "\n\n"),
          ("C10-c", "\\n{3,}", "\n\n"),
          ("C11-a", "(?m)^[ \\t\\x0B\\f\\r]+|[ \\t\\x0B\\f\\r]+$", ""),
          ("C11-b", "\\n{3,}", "\n\n"),
          ("C11-c", "^\\s+|\\s+$", "")
        )

    val totals = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    stages.foreach { case (name, pat, repl) =>
      val p = java.util.regex.Pattern.compile(pat)
      val t0 = System.nanoTime()
      corpus = corpus.map(s => p.matcher(s).replaceAll(repl))
      totals(name) = (System.nanoTime() - t0) / 1e9
    }
    totals.toSeq.sortBy(-_._2).foreach { case (n, s) => println(f"$n%-12s $s%8.3f s") }
    println(f"TOTAL        ${totals.values.sum}%8.3f s")
  }
}
