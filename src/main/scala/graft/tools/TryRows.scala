package graft.tools

import graft.queries.QueryCatalog
import java.nio.file.{Files, Paths}

/** Pre-registration oracle check for candidate catalog rows: dumps the
  * named (query, oracle) pairs exactly like graft.Verify so
  * tools/check_oracles.py can compare them BEFORE they enter the
  * graded maps (useful while a long sweep holds the map snapshot).
  * Usage: run_main.sh graft.tools.TryRows <sfDir> <outDir>
  */
object TryRows {
  def main(args: Array[String]): Unit = {
    val rows: Seq[(String, QueryCatalog.Q, String)] = Seq(
      ("q_gopher_rules", QueryCatalog.qGopherRules, QueryCatalog.qGopherRulesSql),
      ("q_semantic_decontam", QueryCatalog.qSemanticDecontam, QueryCatalog.qSemanticDecontamSql),
      ("q_domain_cap", QueryCatalog.qDomainCap, QueryCatalog.qDomainCapSql),
      ("q_train_order", QueryCatalog.qTrainOrder, QueryCatalog.qTrainOrderSql)
    )
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(args(1)).mkdirs()
    rows.foreach { case (name, q, _) =>
      q(spark, args(0)).repartition(1).write.mode("overwrite").parquet(s"${args(1)}/$name")
      println(s"[tryrows] dumped $name")
    }
    def esc(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"${args(1)}/oracle_sql.json"),
      rows.map { case (n, _, sql) => s"${esc(n)}: ${esc(sql)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
