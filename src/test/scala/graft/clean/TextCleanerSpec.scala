package graft.clean

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Golden tests: Spark battery output must equal the reference
  * semantics (goldens generated from the published pattern set with
  * Python `re`, resources/clean_golden.json) — this pins down the
  * Python-vs-Java regex parity risk (SURVEY.md §7.5 item 3).
  */
class TextCleanerSpec extends SparkTestBase {

  private case class Golden(input: String, clean: String, hwp: String)

  private lazy val goldens: Seq[Golden] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/clean_golden.json"),
      "UTF-8"
    )
    val json = try src.mkString finally src.close()
    // minimal parser for our fixed shape [{"input":..,"clean":..,"hwp":..}]
    val entries = org.json4s.jackson.JsonMethods.parse(json)
    import org.json4s._
    implicit val fmt: Formats = DefaultFormats
    entries.extract[List[Map[String, String]]].map { m =>
      Golden(m("input"), m("clean"), m("hwp"))
    }
  }

  test("clean_text matches reference goldens") {
    import spark.implicits._
    val df = goldens.map(_.input).toDF("text")
      .withColumn("clean", TextCleaner.cleanText(col("text")))
    val got = df.select("clean").as[String].collect()
    goldens.zip(got).foreach { case (g, out) =>
      assert(out == g.clean, s"input=${g.input.take(60)} expected=${g.clean.take(80)} got=${out.take(80)}")
    }
  }

  test("clean_hwp_text matches reference goldens") {
    import spark.implicits._
    val df = goldens.map(_.input).toDF("text")
      .withColumn("hwp", TextCleaner.cleanHwpText(col("text")))
    val got = df.select("hwp").as[String].collect()
    goldens.zip(got).foreach { case (g, out) =>
      assert(out == g.hwp, s"input=${g.input.take(60)} expected=${g.hwp.take(80)} got=${out.take(80)}")
    }
  }

  test("clean_text is idempotent on goldens") {
    import spark.implicits._
    val df = goldens.map(_.clean).toDF("text")
      .withColumn("clean2", TextCleaner.cleanText(col("text")))
    val got = df.select("clean2").as[String].collect()
    goldens.zip(got).foreach { case (g, out) =>
      assert(out == g.clean, s"not idempotent for ${g.clean.take(60)}: got ${out.take(80)}")
    }
  }

  test("collection name normalization (C19)") {
    import spark.implicits._
    val df = Seq("My-Folder Name", "root", null.asInstanceOf[String])
      .toDF("f")
      .select(TextCleaner.collectionName(col("f"), "docs_").as("c"))
    assert(df.as[String].collect().toSeq == Seq("docs_my_folder_name", "docs_root", "docs_root"))
  }
}
