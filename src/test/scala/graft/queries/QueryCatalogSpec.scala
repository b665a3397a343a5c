package graft.queries

import graft.{SparkEntry, SparkTestBase}

class QueryCatalogSpec extends SparkTestBase {

  test("every oracle key names a real query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("catalog names are unique and stable-format") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("[a-z0-9_]+"), s"query name $k not snake_case")
    }
    assert(SparkEntry.queries.size >= 42)
    assert(SparkEntry.oracleSql.size >= 33)
  }

  test("flagship entry returns rows on sf0.001 (driver smoke contract)") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
  }
}
