package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("hashSample is deterministic, id-stable, and close to the target fraction") {
    val a = Sampling.hashSample(docs, "doc_id", 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, "doc_id", 0.3).collect().map(_.getLong(0)).toSet
    assert(a == b) // same subset on every run — no rand()
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.3) < 0.15, s"kept ${a.size}/$n for fraction 0.3")
    // monotone: a larger fraction strictly contains the smaller sample
    val wider = Sampling.hashSample(docs, "doc_id", 0.6).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(wider))
    // fraction edges keep nothing / everything
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() == 0)
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() == n)
  }

  test("stratifiedHashSample applies per-stratum fractions and the default") {
    val out = Sampling
      .stratifiedHashSample(docs, "lang", "doc_id", Map("en" -> 1.0, "zh" -> 0.0),
        defaultFraction = 0.5)
      .collect()
    val byLang = out.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == totals("en")) // fraction 1.0 keeps every row
    assert(!byLang.contains("zh")) // fraction 0.0 keeps none
    for (l <- totals.keySet -- Set("en", "zh")) // default applies to unlisted strata
      assert(byLang.getOrElse(l, 0) > 0 && byLang(l) < totals(l), s"default fraction on $l")
    // membership is per-id, not per-partition: the same ids survive in
    // the flat sample at the same fraction
    val flat = Sampling.hashSample(docs.filter(col("lang") =!= "en" && col("lang") =!= "zh"),
      "doc_id", 0.5).collect().map(_.getLong(0)).toSet
    val strat = out.filter(r => r.getAs[String]("lang") != "en").map(_.getAs[Long]("doc_id")).toSet
    assert(strat == flat)
  }

  test("sampling is a scan-stage filter: no shuffle of the data side") {
    val plan = Sampling
      .stratifiedHashSample(docs, "lang", "doc_id", Map("en" -> 0.5), defaultFraction = 0.1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"fraction table should broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"), s"data side must not shuffle:\n$plan")
  }

  test("weightedResample: integer weights replicate exactly, zero drops, rep is dense") {
    val out = Sampling
      .weightedResample(docs, "lang", "doc_id",
        Map("en" -> 2.0, "zh" -> 0.0), defaultWeight = 1.0)
      .collect()
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = out.groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    assert(byLang("en") == 2 * totals("en"), "weight 2.0 doubles the stratum exactly")
    assert(!byLang.contains("zh"), "weight 0 drops the stratum")
    for (l <- totals.keySet -- Set("en", "zh"))
      assert(byLang(l).toLong == totals(l), s"default weight 1.0 must be identity on $l")
    // rep indices are dense 0..n-1 per id
    out.groupBy(r => r.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val reps = rs.map(_.getAs[Int]("rep")).sorted
      assert(reps === (0 until reps.length).toArray, s"non-dense rep for doc $id")
    }
  }

  test("weightedResample: fractional weight adds the hashSample slice exactly") {
    val out = Sampling
      .weightedResample(docs, "lang", "doc_id", Map("en" -> 1.5), defaultWeight = 0.0)
      .collect()
    val extra = out.filter(_.getAs[Int]("rep") == 1).map(_.getAs[Long]("doc_id")).toSet
    val en = docs.filter(col("lang") === "en")
    val slice = Sampling.hashSample(en, "doc_id", 0.5).collect().map(_.getLong(0)).toSet
    assert(extra == slice, "the +0.5 copies must be exactly the 0.5 hash-sample members")
    assert(out.count(_.getAs[Int]("rep") == 0) == en.count())
  }

  test("trainOrder: (shard, pos) is a pure function of the ids — dense, uniform, replayable") {
    val shards = 8
    val out = Sampling.trainOrder(docs, "doc_id", shards)
      .select("doc_id", "shard", "pos").collect()
    // shard is hashBucket % shards, replayed row-by-row
    val buckets = docs.withColumn("__b", Sampling.hashBucket(col("doc_id")))
      .select("doc_id", "__b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach(r =>
      assert(r.getInt(1) == (buckets(r.getLong(0)) % shards).toInt, s"shard of ${r.getLong(0)}"))
    // pos is dense 1..count within each shard, ordered by (hash, id)
    out.groupBy(_.getInt(1)).foreach { case (sh, rows) =>
      val byPos = rows.sortBy(_.getInt(2))
      assert(byPos.map(_.getInt(2)).toSeq == (1 to rows.length), s"non-dense pos in shard $sh")
      val want = rows.map(_.getLong(0)).sortBy(id => (buckets(id), id))
      assert(byPos.map(_.getLong(0)).toSeq == want.toSeq, s"order in shard $sh")
    }
    // determinism across runs and partition layouts
    val again = Sampling.trainOrder(docs.repartition(13), "doc_id", shards)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet)
  }

  test("trainOrderAuto sizes the shard count from the corpus") {
    val n = docs.count()
    val want = graft.tune.AdaptiveKnobs.trainShards(100L)(n)
    assert(want > 1, s"test corpus should span >1 shard at target 100 (n=$n)")
    val out = Sampling.trainOrderAuto(docs, "doc_id", targetShardRows = 100L)
    val used = out.select("shard").distinct().collect().map(_.getInt(0))
    assert(used.forall(s => s >= 0 && s < want))
    // the auto output is exactly trainOrder at the sized count
    val pinned = Sampling.trainOrder(docs, "doc_id", want)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val auto = out.select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(auto == pinned)
  }

  test("capPerStratum: at most K per stratum, chosen by hash priority, deterministic") {
    val cap = 7
    val out = Sampling.capPerStratum(docs, "source", "doc_id", cap)
    val sizes = out.groupBy("source").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= cap))
    // a stratum smaller than the cap passes through whole
    val before = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    before.foreach { case (s, n) => assert(after(s) == math.min(n, cap.toLong), s) }
    // the kept set is exactly the K lowest (hashBucket, id) per stratum
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val wantKept = docs
      .withColumn("__b", Sampling.hashBucket(col("doc_id")))
      .collect()
      .groupBy(_.getAs[String]("source"))
      .flatMap { case (_, rows) =>
        rows.sortBy(r => (r.getAs[Long]("__b"), r.getAs[Long]("doc_id")))
          .take(cap).map(_.getAs[Long]("doc_id")).toSeq
      }.toSet
    assert(kept == wantKept)
    // rank column is dense 1..k within each stratum
    val ranks = out.filter(col("source") === out.select("source").head().getString(0))
      .select("rank_in_stratum").collect().map(_.getInt(0)).sorted
    assert(ranks.toSeq == (1 to ranks.length))
  }
}
