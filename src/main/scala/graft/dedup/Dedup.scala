package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family. K5 (exact, reference chunker.py:182-207) plus
  * the near-dup operators a large-scale training-data pipeline needs
  * (MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine) — all
  * expressed as declarative plans so Catalyst handles pushdown and AQE
  * handles skew.
  */
object Dedup {

  /** Normalization used by the reference before hashing
    * (chunker.py:193-194): lowercase + whitespace-collapse (Python
    * `' '.join(s.lower().split())` — leading/trailing runs vanish).
    */
  def normalizedText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Exact-hash content key. */
  def contentHash(c: Column): Column = md5(normalizedText(c))

  /** K5 — exact dedup, keep-first. The reference's "first" is Python
    * iteration order; distributed determinism requires an explicit
    * order, so the caller names the tiebreak columns (e.g. source,
    * chunk_index) — SURVEY.md §7.5 item 5.
    *
    * Scale shape: the window is a SINGLE pass over the child — right
    * whenever the child is expensive to recompute (a UDF stage, a
    * parse) or rows are narrow. Its weakness is a massively duplicated
    * group (one boilerplate doc × 10^8 copies funnels into one window
    * task); corpora with that profile over a cheap-to-rescan child use
    * [[exactDedupAggJoin]]. Fat-row pipelines should dedup AFTER
    * projecting the payload down ([[exactDedupByKey]]) — round-11
    * sf100 measured text-through-the-window in the search façade at
    * 37× for a 13.9× decade, pure shuffle spill of a column the query
    * was about to drop.
    */
  def exactDedup(df: DataFrame, textCol: String, orderCols: Seq[String]): DataFrame =
    exactDedupByKey(
      df.withColumn("__h", contentHash(col(textCol))), "__h", orderCols)
      .drop("__h")

  /** [[exactDedup]] with a PRECOMPUTED duplicate-group key column —
    * the entry point for fat-row pipelines: compute the key while the
    * payload is still cheap to scan, project the payload down to what
    * the downstream actually needs, and dedup the NARROW frame so the
    * shuffle never moves the payload. Single-pass (window), so an
    * expensive child (e.g. an embedding UDF) is evaluated exactly
    * once.
    */
  def exactDedupByKey(df: DataFrame, keyCol: String, orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must name a deterministic tiebreak")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Hot-key-safe keep-first for corpora where one duplicate group can
    * be astronomically large (the boilerplate-page profile): winner
    * selection is an ordinary aggregate — groupBy(key).min(struct(
    * orderCols)) — followed by a left-semi equi-join on
    * (key, orderCols). The aggregate partial-aggregates map-side, so
    * the hottest group reaches the reducer as one row per upstream
    * partition, and the join key is unique per row — no funnel
    * anywhere (same no-window rule as [[lineDedupStats]]). The trade:
    * the child is evaluated TWICE (winners branch + join branch) —
    * point it at a cheap scan, or checkpoint an expensive child first;
    * measured at sf10, putting an embed UDF under this variant cost
    * 1.6× vs the single-pass window. orderCols must uniquely identify
    * a row within a duplicate group.
    *
    * Null handling: the semi-join uses NULL-SAFE equality (`<=>`) on
    * the key and every tiebreak column, so a null-key group (or a
    * null inside the winning tiebreak tuple) keeps exactly one
    * representative — identical to the window formulation, where
    * partitionBy/orderBy already treat NULL as an ordinary value. A
    * null-unsafe join here would silently DROP the whole null-key
    * group (no row ever equals its winner), breaking the documented
    * window equivalence (ADVICE r11).
    */
  def exactDedupAggJoin(df: DataFrame, keyCol: String, orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must name a deterministic tiebreak")
    val winners = df
      .groupBy(col(keyCol))
      .agg(min(struct(orderCols.map(col): _*)).as("__w"))
      .select(col(keyCol).as("__wk") +: orderCols.zipWithIndex.map {
        case (c, i) => col(s"__w.$c").as(s"__wo$i")
      }: _*)
    val cond = (keyCol, "__wk") +: orderCols.zipWithIndex.map { case (c, i) => (c, s"__wo$i") }
    df.join(winners, cond.map { case (l, r) => df(l) <=> winners(r) }.reduce(_ && _), "left_semi")
  }

  /** Corpus-wide LINE-level dedup stats — the C4/RefinedWeb
    * preprocessing step: every non-empty (trimmed) line is kept only at
    * its FIRST occurrence across the whole corpus (boilerplate
    * navigation, cookie banners, repeated headers collapse to one
    * copy). Deterministic distributed "first" = (doc_id, line_index)
    * order, same contract as [[exactDedup]]. Returns per-doc
    * (n_lines, n_kept, kept_ratio) — the survival profile a corpus
    * curation pipeline filters on.
    *
    * Plan shape at 100 TB: a boilerplate line is a GUARANTEED hot key
    * (the workload exists because one banner appears in 30% of docs),
    * so the global "first occurrence" must never be a row_number window
    * over the raw occurrences — a window cannot partial-aggregate and
    * the hot line's billions of rows would funnel into one task.
    * Instead: aggregate to (doc, line) first (keyed by the pair — no
    * hot key), then take min(struct(doc_id, first_idx)) per line — an
    * ordinary aggregate with MAP-SIDE COMBINE, so even the hottest line
    * arrives at the reducer as one row per upstream partition. No
    * window anywhere.
    *
    * Known recompute: the (doc, line) aggregate feeds two branches
    * (global firsts + the stats join), and per-branch column pruning
    * makes the exchanges non-identical, so ReuseExchange cannot dedupe
    * them — the scan+explode runs twice. Deliberate DEFAULT: the
    * duplicate is shuffle-free map work, while persisting a tokenized
    * 100 TB corpus to dodge it costs more than it saves. Memory-rich
    * callers opt in with `reuse = true` (VERDICT r3 #6): the (doc,
    * line) aggregate is persisted MEMORY_AND_DISK before branching, so
    * the scan+explode runs once and both branches read the cache. The
    * caller owns the cache lifetime (unpersist via
    * `spark.catalog.clearCache()` or drop the session).
    */
  def lineDedupStats(
      df: DataFrame, idCol: String, textCol: String, reuse: Boolean = false): DataFrame = {
    val lines = df
      .select(col(idCol).as("doc_id"), posexplode(split(col(textCol), "\n")).as(Seq("idx", "raw")))
      .withColumn("ln", trim(col("raw")))
      .filter(length(col("ln")) > 0)
      .select("doc_id", "idx", "ln")
    val docLines0 = lines
      .groupBy("doc_id", "ln")
      .agg(count(lit(1)).as("c"), min(col("idx")).as("first_idx"))
    val docLines =
      if (reuse) docLines0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else docLines0
    val firsts = docLines
      .groupBy("ln")
      .agg(min(struct(col("doc_id"), col("first_idx"))).as("first"))
    docLines
      .join(firsts, Seq("ln"))
      .groupBy("doc_id")
      .agg(
        sum(col("c")).as("n_lines"),
        sum(
          when(col("first.doc_id") === col("doc_id") && col("first.first_idx") === col("first_idx"), 1L)
            .otherwise(0L)
        ).as("n_kept")
      )
      .select(
        col("doc_id"),
        col("n_lines"),
        col("n_kept"),
        round(col("n_kept").cast("double") / col("n_lines"), 6).as("kept_ratio")
      )
  }

  /** Word-level shingles (n-grams of tokens) as the MinHash universe. */
  def shingles(textCol: Column, n: Int): Column = {
    val tokens = split(normalizedText(textCol), " ")
    when(size(tokens) < n, array(concat_ws(" ", tokens)))
      .otherwise(
        transform(
          sequence(lit(0), size(tokens) - n),
          i => concat_ws(" ", slice(tokens, i + 1, lit(n)))
        )
      )
  }

  /** Distinct word n-grams in ONE fused pass (UDF) — a
    * LinkedHashSet-dedup over [[shingleArray]], so the signature
    * builder, the candidate verifier, and this index-side helper share
    * ONE tokenize+shingle implementation (and therefore one canonical
    * empty-doc behavior: zero tokens → zero shingles). Fused because
    * the HOF transform/slice/concat_ws pipeline materializes an
    * intermediate array per shingle (~8 s of q_decontaminate at sf0.1;
    * same lesson as the MinHash signature builder). Marked
    * nondeterministic so the optimizer never duplicates it into
    * inferred filters under a later explode (InferFiltersFromGenerate).
    */
  def distinctShingles(textCol: Column, n: Int): Column = {
    val f = udf { (text: String) =>
      val seen = new java.util.LinkedHashSet[String]
      shingleArray(text, n).foreach(seen.add)
      import scala.jdk.CollectionConverters._
      seen.asScala.toSeq
    }
    f.asNondeterministic()(textCol)
  }

  /** Tokenize + shingle, as a plain Scala function shared by the
    * signature builder, the candidate verifier, and the index-side
    * [[distinctShingles]] so all see the exact same shingle universe.
    * Zero tokens → ZERO shingles (the DuckDB oracles encode the same
    * rule explicitly). Locale.ROOT lowercasing — default-locale
    * toLowerCase diverges from engine lower() under tr/az locales
    * (dotless ı) and Greek final sigma.
    */
  private[dedup] def shingleArray(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
    if (toks.length == 0) Array.empty
    else if (toks.length < n) Array(toks.mkString(" "))
    else Array.tabulate(toks.length - n + 1)(i => toks.slice(i, i + n).mkString(" "))
  }

  /** MinHash signature straight from text: tokenize → shingle → hash
    * in ONE fused pass per row. No intermediate shingle arrays in the
    * plan (materializing them via transform/slice/concat_ws was 8.8s of
    * a 9.2s run at sf0.1), and no distinct — min over a multiset equals
    * min over the set. Per shingle: 2 string murmurs + numHashes
    * splitmix64 remixes.
    */
  def minHashSignatureFromText(textCol: Column, shingleSize: Int, numHashes: Int): Column = {
    val f = udf { (text: String) =>
      val sig = Array.fill(numHashes)(Long.MaxValue)
      shingleArray(text, shingleSize).foreach { sh =>
        val hi = scala.util.hashing.MurmurHash3.stringHash(sh, 0x9747b28c)
        val lo = scala.util.hashing.MurmurHash3.stringHash(sh, 0x85ebca6b)
        val base = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
        var s = 0
        while (s < numHashes) {
          var z = base ^ (s * 0x9e3779b97f4a7c15L)
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e9b9L
          z ^= (z >>> 27)
          if (z < sig(s)) sig(s) = z
          s += 1
        }
      }
      sig.toSeq
    }
    f(textCol)
  }

  /** Exact shingle-set Jaccard of two texts (verifier for LSH
    * candidates — runs only on the surviving pairs).
    */
  def shingleJaccard(aText: Column, bText: Column, shingleSize: Int): Column = {
    val f = udf { (a: String, b: String) =>
      val sa = shingleArray(a, shingleSize).toSet
      val sb = shingleArray(b, shingleSize).toSet
      val union = sa.size + sb.size - sa.intersect(sb).size
      if (union == 0) 0.0 else sa.intersect(sb).size.toDouble / union
    }
    f(aText, bText)
  }

  /** MinHash + LSH banding near-dup candidate pairs.
    * signature[numHashes] split into `bands` bands of rows; docs
    * sharing any band bucket become candidates (equi-JOIN on the band
    * hash — the scale path: no cross product, shuffle keyed by bucket).
    * Candidates are then verified with true Jaccard over shingle sets.
    *
    * Returns pairs (id_a < id_b) with estimated + exact Jaccard.
    */
  def minHashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8,
      jaccardThreshold: Double = 0.8
  ): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val base = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", minHashSignatureFromText(col("text"), shingleSize, numHashes))

    // band hash: one bucket key per band = hash of that signature slice.
    // The banded rows carry ONLY (id, band, bucket) — shingle arrays
    // never travel through the candidate join (at scale the arrays are
    // the shuffle volume, not the ids).
    val banded = base
      .select(
        col("id"),
        posexplode(
          array((0 until bands).map(b => hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*)
        ).as(Seq("band", "bucket"))
      )

    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = l
      .join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    // verify only the (sparse) candidates: attach the raw texts by id
    // and recompute exact shingle-set Jaccard just for those pairs
    val texts = base.select(col("id"), col("text"))
    candidates
      .join(texts.select(col("id").as("id_a"), col("text").as("text_a")), Seq("id_a"))
      .join(texts.select(col("id").as("id_b"), col("text").as("text_b")), Seq("id_b"))
      .withColumn("jaccard", shingleJaccard(col("text_a"), col("text_b"), shingleSize))
      .filter(col("jaccard") >= jaccardThreshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Benchmark decontamination: find corpus documents that CONTAIN a
    * large share of an eval-set item's n-grams — the asymmetric overlap
    * (|corpus ∩ bench| / |bench|) used to scrub test-set leakage from
    * training corpora (the n-gram-overlap decontamination procedure
    * described in public LM reports). Same inverted-index shape as
    * [[ngramJaccardPairs]]: explode distinct n-grams, equi-join on the
    * gram (long n-grams — 8+ tokens — are near-unique, so the gram key
    * is itself the blocker; no quadratic pair formation), count shared
    * grams per (corpus, bench) pair, divide by the BENCH side's gram
    * count. Benchmark side is typically tiny → its gram index
    * broadcasts; corpus side streams.
    */
  def containmentPairs(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      threshold: Double = 0.5
  ): DataFrame = {
    def grams(df: DataFrame, asId: String) =
      df.select(col(idCol).as(asId), distinctShingles(col(textCol), n).as("gs"))
    val c = grams(corpus, "doc_id")
    val b = grams(benchmark, "bench_id")
    val bSizes = b.select(col("bench_id"), size(col("gs")).as("bench_sz"))
    val cEx = c.select(col("doc_id"), explode(col("gs")).as("g"))
    val bEx = b.select(col("bench_id"), explode(col("gs")).as("g"))
    cEx
      .join(broadcast(bEx), Seq("g"))
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(bSizes), Seq("bench_id"))
      .withColumn("containment", col("inter").cast("double") / col("bench_sz").cast("double"))
      .filter(col("containment") >= threshold)
      .select("doc_id", "bench_id", "containment")
  }

  /** [[containmentPairs]] with a BLOOM-FILTER PREFILTER on the corpus
    * gram stream — the broadcast-lean 100 TB shape. The exact path
    * broadcasts the benchmark's full gram INDEX; fine while the eval
    * sets are small, but at a few hundred million benchmark grams the
    * index outgrows broadcast and the equi-join must shuffle the ENTIRE
    * corpus gram stream (trillions of rows, almost all of which match
    * nothing). A Bloom filter over the benchmark grams costs ~1.2
    * bytes/gram at 1% fpp (vs tens of bytes/gram for the index),
    * always broadcasts, and drops non-matching corpus grams BEFORE the
    * shuffle — the stream shrinks to true hits + fpp.
    *
    * Bloom filters have NO false negatives, and every survivor still
    * flows through the exact gram join, so the result is IDENTICAL to
    * [[containmentPairs]] for any fpp — the graded row shares the
    * exact oracle, and the spec asserts equality with the exact path.
    * Spark's `DataFrameStatFunctions.bloomFilter` builds the filter as
    * a treeAggregate over the gram stream (no driver-side item list).
    *
    * The gram equi-join carries NO broadcast hint: exactly in the
    * regime that motivates this function the benchmark index outgrows
    * broadcast, and a forced hint would OOM the driver. While the index
    * is small AQE picks a broadcast join on its own; past the threshold
    * it degrades to a shuffle join over the bloom-pruned (tiny)
    * survivor stream. Only bSizes (one row per benchmark item) keeps
    * the hint. The bloom probe itself is a codegen'd predicate
    * ([[graft.functions.BloomMightContain]]) directly above the
    * shingle explode, in the SAME whole-stage-codegen stage — pruned
    * grams die before anything downstream sees them (the dedup'd gram
    * array is built per doc either way, so probing the exploded values
    * is equivalent to the old probe-inside-the-UDF form, minus the
    * boxed per-gram lambda frame).
    */
  def bloomContainmentPairs(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      threshold: Double = 0.5,
      fpp: Double = 0.01
  ): DataFrame = {
    val spark = corpus.sparkSession
    val b = benchmark.select(col(idCol).as("bench_id"), distinctShingles(col(textCol), n).as("gs"))
    val bEx = b.select(col("bench_id"), explode(col("gs")).as("g"))
    val bGrams = bEx.select("g").distinct()
    val nGrams = math.max(1L, bGrams.count())
    val bloom = bGrams.stat.bloomFilter("g", nGrams, fpp)
    val bloomB = spark.sparkContext.broadcast(bloom)
    val bSizes = b.select(col("bench_id"), size(col("gs")).as("bench_sz"))
    val cEx = corpus
      .select(col(idCol).as("doc_id"),
        explode(distinctShingles(col(textCol), n)).as("g"))
      .filter(graft.functions.BloomExpressions.mightContain(col("g"), bloomB))
    cEx
      .join(bEx, Seq("g"))
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(bSizes), Seq("bench_id"))
      .withColumn("containment", col("inter").cast("double") / col("bench_sz").cast("double"))
      .filter(col("containment") >= threshold)
      .select("doc_id", "bench_id", "containment")
  }

  /** Connected components over a near-dup PAIR list — the step that
    * turns pairwise candidates into an actionable dedup: docs A–B and
    * B–C are the same cluster even though A–C never surfaced as a
    * pair, and keep-one-per-cluster must see that. Returns
    * (id, cluster_id) for every id appearing in `pairs`, cluster_id =
    * the smallest id in the component (deterministic representative).
    *
    * Algorithm: alternating large-star / small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — each round every node links its larger (large-star)
    * resp. not-larger (small-star) neighbors directly to the minimum
    * of its closed neighborhood. Both operations preserve
    * connectivity, and alternating them converges to per-component
    * stars around the minimum id in O(log n) rounds INDEPENDENT of
    * graph diameter — the property plain min-label propagation lacks
    * (it needs diameter rounds, so a 10^6-node chain would need 10^6
    * shuffles; the star rounds need ~20). Each half-round is one
    * min-aggregate keyed by node plus one keyed join — no driver-side
    * graph, no super-linear shuffle. Lineage is truncated per round
    * with an eager localCheckpoint (iterative plans otherwise double
    * in depth every round); the convergence check (edge set reached
    * the star fixpoint) rides the same materialization.
    */
  def nearDupClusters(
      pairs: DataFrame,
      idACol: String = "id_a",
      idBCol: String = "id_b",
      maxIter: Int = 25
  ): DataFrame =
    nearDupClustersWithRounds(pairs, idACol, idBCol, maxIter)._1

  /** [[nearDupClusters]] plus the number of contraction rounds
    * EXECUTED — the loop is eager (per-round localCheckpoint + count),
    * so the count is known by return time. Convergence is detected by
    * a round producing no change, so the returned count always
    * includes that final fixpoint-confirming identity round (≥ 1 even
    * for an input already at the fixpoint); productive contractions =
    * rounds − 1. Probes use it to verify the O(log n) claim at decade
    * scale (SCALE.md); the DataFrame result is identical to
    * [[nearDupClusters]]'s.
    */
  def nearDupClustersWithRounds(
      pairs: DataFrame,
      idACol: String = "id_a",
      idBCol: String = "id_b",
      maxIter: Int = 25
  ): (DataFrame, Int) = {
    // closed-neighborhood minimum per node over the undirected edge set
    def withMins(e: DataFrame): DataFrame = {
      val nbrs = e
        .select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      val mins = nbrs
        .groupBy("u")
        .agg(min(col("v")).as("__minv"))
        .select(col("u"), least(col("u"), col("__minv")).as("m"))
      nbrs.join(mins, Seq("u"))
    }
    // large-star: every neighbor larger than u links to u's minimum.
    // No distinct here — duplicates ride one half-round into
    // small-star's min-aggregate (which is duplicate-blind) and its
    // final distinct; dropping the exchange halves per-round stages
    def largeStar(e: DataFrame): DataFrame =
      withMins(e)
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
    // small-star: u and its smaller neighbors all link to u's minimum
    def smallStar(e: DataFrame): DataFrame = {
      val n = withMins(e)
      n.filter(col("v") < col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .unionByName(n.select(col("u").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b"))
        .distinct()
    }

    var edges = pairs
      .select(col(idACol).as("a"), col(idBCol).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var count = edges.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      // both sides are distinct sets, so equal counts + empty one-sided
      // difference ⇔ set equality; the count comparison (cheap on the
      // checkpointed blocks) skips the except join on still-moving rounds
      val nextCount = next.count()
      converged =
        nextCount == count && next.exceptAll(edges).limit(1).count() == 0
      edges = next
      count = nextCount
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"nearDupClusters did not converge in $maxIter rounds — star contraction needs " +
          "O(log n) rounds, so this indicates a pathological input; raise maxIter")
    // fixpoint = per-component stars around the min id: every non-min
    // node carries exactly one (node → min) edge; centers label themselves
    val labeled = edges
      .select(col("a").as("id"), col("b").as("cluster_id"))
      .unionByName(edges.select(col("b").as("id"), col("b").as("cluster_id")))
      .distinct()
    (labeled, iter)
  }

  /** Keep-one-per-cluster dedup: drop every row whose id belongs to a
    * near-dup cluster but is not its (min-id) representative.
    * Singletons — ids never appearing in `pairs` — are kept untouched.
    */
  def dedupByNearDup(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = nearDupClusters(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Exact Jaccard over two (distinct-element) array columns. */
  def jaccardExpr(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0, lit(0.0)).otherwise(inter / union)
  }

  /** N-gram (token) Jaccard near-dup pairs WITHOUT LSH — the exact
    * quadratic baseline, blocked by a cheap key (e.g. language) to
    * bound the cross product. Suitable as a correctness oracle for the
    * LSH path and for modest block sizes.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      threshold: Double
  ): DataFrame = {
    // Inverted-index formulation: explode distinct tokens, self-join on
    // (block, token) to COUNT shared tokens per pair, then derive
    // jaccard = inter / (|A| + |B| - inter). No array columns ever
    // cross the shuffle — volume is O(total tokens + co-occurring
    // pairs), the standard scalable set-similarity-join shape.
    val t = df.select(
      col(idCol).as("id"),
      col(blockCol).as("block"),
      array_distinct(split(normalizedText(col(textCol)), " ")).as("toks")
    )
    val sizes = t.select(col("id"), col("block"), size(col("toks")).as("sz"))
    val ex = t.select(col("id"), col("block"), explode(col("toks")).as("token"))

    val a = ex.select(col("block"), col("token"), col("id").as("id_a"))
    val b = ex.select(col("block"), col("token"), col("id").as("id_b"))
    val inter = a
      .join(b, Seq("block", "token"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("block"), col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))

    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn(
        "jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")).cast("double")
      )
      .filter(col("jaccard") >= threshold)
      .select("block", "id_a", "id_b", "jaccard")
  }

  /** Prefix-filtered set-similarity join — the open-vocabulary scale
    * path (standard prefix-filtering: for J(A,B) >= t, A and B must
    * share at least one of each other's ⌊(1-t)·|X|⌋+1 RAREST tokens).
    * Only prefix tokens are indexed, so hot tokens (stopwords) never
    * drive the candidate join; candidates are verified exactly.
    * Complements [[jaccardBitmapPairs]] (dense small vocab) and
    * [[minHashLshPairs]] (probabilistic).
    */
  def prefixJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      broadcastMaxDocs: Long = 100_000L
  ): DataFrame = {
    // Size the slice FIRST (a count-star over the input — at parquet
    // scale this reads footer metadata, not rows). Small slices
    // (per-language blocks, bounded batches) broadcast the frequency,
    // index and verify sides below and skip four shuffles; big
    // open-vocab slices keep every shuffle join. Gating on doc count
    // is safe for the vocabulary side too: Heaps' law keeps the vocab
    // of a 100k-doc slice far below the token arrays the verify
    // broadcast already ships under the same gate.
    val small = df.count() <= broadcastMaxDocs
    def maybeBroadcast(x: DataFrame): DataFrame = if (small) broadcast(x) else x

    val t0 = df.select(
      col(idCol).as("id"),
      array_distinct(split(normalizedText(col(textCol)), " ")).as("toks")
    )
    // Small slices also materialize the tokenization: `ex` feeds both
    // the frequency aggregate and the join stream side, so without
    // this the scan+normalize+split runs twice. Gated on `small`
    // because the checkpoint stores corpus-sized token arrays — a big
    // slice prefers the second streamed pass over doubling storage.
    val t = if (small) t0.localCheckpoint() else t0
    // Global token frequencies define the rarity order. The order is
    // only ever consumed per-doc (sort_array below), so the frequency
    // table is NEVER globally ranked — a row_number() over an
    // unpartitioned window here would funnel the whole vocabulary
    // through one task at open-vocab scale. Sorting by the
    // (count, token) struct gives the identical rarest-first order
    // with zero windows.
    val ex = t.select(col("id"), explode(col("toks")).as("token"))
    val freq = ex.groupBy("token").count()
    // MATERIALIZED once (localCheckpoint): the tokenize→freq-join→sort
    // subtree is consumed THREE times downstream (prefix index + both
    // verify joins) — without materialization Spark re-executes it per
    // consumer, tripling the dominant shuffle (measured 2x wall on the
    // graded slice). Block-manager storage spills to disk, so this
    // holds at corpus scale the same way dedupClusters' per-round
    // checkpoint does.
    val docTokens = ex
      .join(maybeBroadcast(freq), Seq("token"))
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("count"), col("token")))).as("ct"))
      .select(
        col("id"),
        col("ct.token").as("sorted_toks"),
        size(col("ct")).as("sz")
      )
      .localCheckpoint()

    // index only the prefix
    val prefixLen = ceil((lit(1.0) - threshold) * col("sz")).cast("int") + 1
    val prefix = docTokens
      .select(col("id"), col("sz"), explode(slice(col("sorted_toks"), lit(1), prefixLen)).as("token"))

    val a = prefix.select(col("token"), col("id").as("id_a"), col("sz").as("sz_a"))
    val b = prefix.select(col("token"), col("id").as("id_b"), col("sz").as("sz_b"))
    val candidates = a
      .join(maybeBroadcast(b), Seq("token"))
      .filter(col("id_a") < col("id_b"))
      .filter(
        col("sz_a").cast("double") >= lit(threshold) * col("sz_b") &&
          col("sz_b").cast("double") >= lit(threshold) * col("sz_a")
      )
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")

    val sets = docTokens.select(col("id"), col("sorted_toks"))
    candidates
      .join(maybeBroadcast(sets.select(col("id").as("id_a"), col("sorted_toks").as("t_a"))), Seq("id_a"))
      .join(maybeBroadcast(sets.select(col("id").as("id_b"), col("sorted_toks").as("t_b"))), Seq("id_b"))
      // One hash pass per pair, not two: candidates share >= 1 prefix
      // token by construction, so the union is never empty and
      // |A∪B| = |A| + |B| - |A∩B| replaces the second array_union scan
      // (both arrays are distinct by array_distinct above).
      .withColumn("inter", size(array_intersect(col("t_a"), col("t_b"))).cast("double"))
      .withColumn(
        "jaccard",
        col("inter") / (size(col("t_a")) + size(col("t_b")) - col("inter"))
      )
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Bitmap set-similarity join: dictionary-encode tokens, pack each
    * row's token set into a bitmap, enumerate same-block pairs and
    * compute exact Jaccard as popcount(a AND b) / popcount(a OR b).
    * Per-pair cost is O(vocab/64) with an 8-byte-per-word row payload —
    * the shape that survives dense near-dup corpora where inverted
    * indexes explode (every token shared by every doc) and array
    * intersections pay per-element hashing. Vocab ≤ 64 uses a single
    * long column (pure codegen bit ops, no arrays anywhere).
    * For open vocabularies (millions of tokens) use
    * [[ngramJaccardPairs]] / [[minHashLshPairs]] instead.
    */
  def jaccardBitmapPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      threshold: Double,
      maxVocab: Int = 1 << 16
  ): DataFrame = {
    val t = df.select(
      col(idCol).as("id"),
      col(blockCol).as("block"),
      array_distinct(split(normalizedText(col(textCol)), " ")).as("toks")
    )
    // Token dictionary. Contiguous ids [0, vocab) are assigned with a
    // distributed zipWithIndex over the sorted tokens — no
    // single-partition window, so even a misuse-sized vocabulary never
    // funnels through one task before the fence below trips.
    val spark = df.sparkSession
    val tokens = t.select(explode(col("toks")).as("token")).distinct()
    val dict = spark.createDataFrame(
      tokens.orderBy("token").rdd.zipWithIndex.map { case (row, idx) =>
        org.apache.spark.sql.Row(row.getString(0), idx.toInt)
      },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("token", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("tid", org.apache.spark.sql.types.IntegerType)
      ))
    )
    val vocabLong = dict.count() // one small job, like an index build
    // The whole design (broadcast dict, per-row vocab-width bitmaps)
    // assumes a closed vocabulary. Fail loudly on misuse instead of
    // melting down slowly — open vocabularies belong to
    // ngramJaccardPairs / prefixJaccardPairs / minHashLshPairs.
    // Fence on the Long count BEFORE any Int narrowing: a >2^31 token
    // vocabulary must trip the require, not wrap around it.
    require(
      vocabLong <= maxVocab,
      s"jaccardBitmapPairs: vocabulary $vocabLong exceeds maxVocab=$maxVocab — " +
        "use ngramJaccardPairs/prefixJaccardPairs/minHashLshPairs for open vocabularies"
    )
    val vocab = vocabLong.toInt
    val ex = t
      .select(col("id"), col("block"), explode(col("toks")).as("token"))
      .join(broadcast(dict), Seq("token"))

    if (vocab <= 64) {
      // single-long bitmap: everything stays in whole-stage codegen
      val bitmaps = ex
        .groupBy(col("id"), col("block"))
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), tid)")).as("bm"), count(lit(1)).as("sz"))
      val a = bitmaps.select(col("block"), col("id").as("id_a"), col("bm").as("bm_a"), col("sz").as("sz_a"))
      val b = bitmaps.select(col("block"), col("id").as("id_b"), col("bm").as("bm_b"), col("sz").as("sz_b"))
      a.join(b, Seq("block"))
        .filter(col("id_a") < col("id_b"))
        .filter(
          col("sz_a").cast("double") >= lit(threshold) * col("sz_b") &&
            col("sz_b").cast("double") >= lit(threshold) * col("sz_a")
        )
        .withColumn("inter", bit_count(col("bm_a").bitwiseAND(col("bm_b"))).cast("long"))
        .withColumn("union_", bit_count(col("bm_a").bitwiseOR(col("bm_b"))).cast("long"))
        .withColumn("jaccard", col("inter").cast("double") / col("union_").cast("double"))
        .filter(col("jaccard") >= threshold)
        .select("block", "id_a", "id_b", "jaccard")
    } else {
      val words = (vocab + 63) / 64
      val pack = udf { (tids: Seq[Int]) =>
        val bm = new Array[Long](words)
        tids.foreach(t => bm(t >>> 6) |= (1L << (t & 63)))
        bm.toSeq
      }
      val interUdf = udf { (a: Seq[Long], b: Seq[Long]) =>
        var s = 0L; var i = 0
        while (i < a.length) { s += java.lang.Long.bitCount(a(i) & b(i)); i += 1 }
        s
      }
      val bitmaps = ex
        .groupBy(col("id"), col("block"))
        .agg(collect_list(col("tid")).as("tids"))
        .select(col("id"), col("block"), pack(col("tids")).as("bm"), size(col("tids")).as("sz"))
      val a = bitmaps.select(col("block"), col("id").as("id_a"), col("bm").as("bm_a"), col("sz").as("sz_a"))
      val b = bitmaps.select(col("block"), col("id").as("id_b"), col("bm").as("bm_b"), col("sz").as("sz_b"))
      a.join(b, Seq("block"))
        .filter(col("id_a") < col("id_b"))
        .filter(
          col("sz_a").cast("double") >= lit(threshold) * col("sz_b") &&
            col("sz_b").cast("double") >= lit(threshold) * col("sz_a")
        )
        .withColumn("inter", interUdf(col("bm_a"), col("bm_b")))
        .withColumn("jaccard", col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
        .filter(col("jaccard") >= threshold)
        .select("block", "id_a", "id_b", "jaccard")
    }
  }

  /** SimHash: 64-bit signature where bit i is set iff the majority of
    * token hashes have bit i set. Single pass over the tokens per row
    * (a Column-expression formulation needs one aggregate traversal per
    * bit — 64× the work; measured 9.7s vs <1s at sf0.01).
    *
    * Two token hashes (VERDICT r3 #5):
    *  - DEFAULT (`portableHash = false`): Spark's own XXH64 kernel over
    *    the UTF-8 bytes — the exact function behind
    *    `functions.xxhash64`, ~10× cheaper than MD5 per token. The
    *    production path.
    *  - PORTABLE (`portableHash = true`): first 8 bytes (big-endian) of
    *    MD5 over UTF-8 — replicable bit-for-bit by any engine with
    *    md5() (the DuckDB correctness oracle does exactly that).
    * Both are deterministic across JVMs and partitions; signature
    * quality is equivalent (any well-mixed 64-bit hash gives the same
    * near-dup behavior — DedupSpec pins identical pair sets on the
    * fixture corpus, and q_simhash_fast pins them on the real corpus).
    */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[dedup] def tokenHash64(t: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
  }

  private[dedup] def tokenHash64Fast(t: String): Long = {
    val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
  }

  def simHash(textCol: Column, portableHash: Boolean = false): Column = {
    val hashFn: String => Long = if (portableHash) tokenHash64 else tokenHash64Fast
    val f = udf { (s: String) =>
      if (s == null) 0L
      else {
        val toks = s.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
        val counts = new Array[Int](64)
        var n = 0
        toks.foreach { t =>
          val h = hashFn(t)
          var i = 0
          while (i < 64) {
            if (((h >>> i) & 1L) == 1L) counts(i) += 1
            i += 1
          }
          n += 1
        }
        var sig = 0L
        var i = 0
        while (i < 64) {
          if (counts(i) * 2 > n) sig |= (1L << i)
          i += 1
        }
        sig
      }
    }
    f(textCol)
  }

  /** Hamming distance between two 64-bit signatures. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Sentinel for `simHashPairs(blocks = _)`: size the block count from
    * a count of the input via [[adaptiveSimHashBlocks]].
    */
  val AdaptiveBlocks: Int = -1

  /** Block count minimizing the SimHash candidate join's expected
    * row volume — the knob that keeps the join LINEAR as the corpus
    * grows (round-11 sf100 finding: the fixed `maxHamming+1 = 4`
    * blocks key on 16 signature bits, so candidate pairs grow as
    * n²/2^16 — 7.6e6 at 500k docs, 7.6e8 at 5M, and the graded row
    * went 39× for 13.5× the characters). With `b` segments keyed on
    * every (b − d)-subset, the key widens to ~(b − d)·64/b bits while
    * the pigeonhole guarantee is unchanged (≤ d differing bits touch
    * ≤ d segments, so some (b − d)-subset agrees exactly) — but each
    * doc explodes into C(b, d) keys, so more blocks is not free. The
    * choice minimizes the two terms' sum under a uniform signature
    * model:
    *
    *   cost(b) = n · C(b, d)                   (exploded join input)
    *           + C(n, 2) · Σ_subsets 2^−width  (expected FP collisions)
    *
    * e.g. d=3: 5k docs → 4 blocks (the legacy banding), 5M docs →
    * 5 blocks (10 keys/doc, FP ~3.7e6 instead of 7.6e8). The search is
    * bounded at d+8: C(d+8, d) explosion already dominates any
    * realistic n there.
    */
  def adaptiveSimHashBlocks(n: Long, maxHamming: Int = 3): Int =
    graft.tune.AdaptiveKnobs.simHashBlocks(maxHamming)(n)

  /** SimHash near-dup pairs: split the 64-bit signature into `blocks`
    * near-equal segments and key candidates on every
    * (blocks − maxHamming)-subset of them — a pair within Hamming
    * distance d ≤ maxHamming differs in at most d segments, so by
    * pigeonhole some (blocks − d)-subset of segments matches exactly
    * and the pair always surfaces as a candidate (exact recall at ANY
    * block count ≥ d+1). `blocks = maxHamming + 1` is the classic
    * one-segment-key banding; larger block counts trade more candidate
    * keys per doc (C(blocks, d)) for exponentially wider keys — the
    * default sizes that trade from the corpus count
    * ([[adaptiveSimHashBlocks]]), which keeps false-positive
    * candidates ≤ n at any scale. The candidate SET after the Hamming
    * verify is identical for every block count, so the choice is pure
    * capacity planning. Candidates are verified by full Hamming
    * distance.
    */
  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      portableHash: Boolean = false,
      blocks: Int = AdaptiveBlocks
  ): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    val nBlocks =
      if (blocks == AdaptiveBlocks) adaptiveSimHashBlocks(df.count(), maxHamming)
      else blocks
    require(
      nBlocks > maxHamming && nBlocks <= 64,
      s"blocks must be in (maxHamming, 64]: $nBlocks")
    // segment s covers bits [bounds(s), bounds(s+1)) — near-equal widths
    val bounds = (0 to nBlocks).map(i => i * 64 / nBlocks)
    def segment(s: Int): Column = {
      val width = bounds(s + 1) - bounds(s)
      val mask = if (width >= 64) -1L else (1L << width) - 1
      shiftright(col("sig"), bounds(s)).bitwiseAND(lit(mask))
    }
    // one candidate key per (nBlocks - d)-subset of segments: the
    // subset's segment values packed little-endian into one LONG via
    // shift+OR (bitwise, never overflow-checked — a multiply would
    // throw under ANSI when a d=0 subset fills all 64 bits)
    val subsets = (0 until nBlocks).combinations(nBlocks - maxHamming).toSeq
    val keys = subsets.map { ss =>
      ss.foldLeft((lit(0L), 0)) { case ((acc, shift), s) =>
        (acc.bitwiseOR(shiftleft(segment(s), shift)), shift + (bounds(s + 1) - bounds(s)))
      }._1
    }
    val sigs = df.select(col(idCol).as("id"), simHash(col(textCol), portableHash).as("sig"))
    val banded = sigs.select(
      col("id"),
      col("sig"),
      posexplode(array(keys: _*)).as(Seq("band", "bucket"))
    )
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    // Verify (cheap codegen'd xor+popcount) BEFORE deduplicating: the
    // narrow bands produce far more false-positive collisions than true
    // pairs, so filtering first keeps the dropDuplicates shuffle to the
    // (tiny) surviving pair set. Duplicate candidates carry identical
    // hamming, so the reorder is semantics-preserving.
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hammingDistance(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
      .select("id_a", "id_b", "hamming")
  }

  /** Derive the sign-bit blocking width from the corpus size: enough
    * bits that the EXPECTED bucket stays near `targetBucketRows`, so
    * within-bucket verify work (Σ C(bucket, 2) exact cosines) stays
    * ~linear in n as the corpus grows. Fixed-width blocking is the
    * classic near-dup scaling trap — measured in the round-9 sf10
    * probe: 4 pinned bits = 16 buckets turned 20k → 200k vectors into
    * 12.5M → 1.25G candidate pairs (quadratic), 3.5 s → 123 s. With
    * width ∝ log2(n) the per-bucket population is flat at any scale.
    * Clamped to [4, 24]: below 4 bits blocking does nothing useful,
    * above 24 the key outruns the sign stability of real embedding
    * components (and 16M buckets already covers petabyte-scale counts
    * at the default target).
    */
  def adaptiveSignBits(n: Long, targetBucketRows: Long = 4096L): Int =
    graft.tune.AdaptiveKnobs.signBits(targetBucketRows)(n)

  /** Sentinel for `signBits`: size the blocking key from a count of the
    * input via [[adaptiveSignBits]] (one extra scan — noise next to the
    * pair join it right-sizes).
    */
  val AdaptiveBits: Int = -1

  /** Sign-bit LSH key over components [startBit, startBit + width):
    * bit i set when component startBit+i is non-negative (the cheap
    * random-hyperplane surrogate given hashed embeddings).
    */
  private def signKey(v: Column, startBit: Int, width: Int): Column =
    (0 until width)
      .map(i => when(element_at(v, startBit + i + 1) >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << i))
      .reduce(_ + _)

  /** Exact-cosine verify of all index pairs within one bucket's member
    * list — tight primitive-double loops, left-to-right accumulation so
    * the result is bit-identical to the
    * [[graft.functions.VectorFunctions.cosineSimilarity]] Column
    * formulation (dot and self-dot fold left over exact float→double
    * promotions; zero-norm members pair with nothing, matching the
    * Column form's null cosine being filtered).
    *
    * The pair enumeration is TILED (round-11 sf100 finding): the naive
    * i<j sweep re-streams every later vector per row, so once a bucket
    * outgrows L3 (~4k × 1024-dim doubles = 32 MB at the adaptive
    * width's default target) the loop turns DRAM-bound — per-pair cost
    * grew 6× from sf10 to sf100 (pairs 3.18e8 → 4.37e9 = 13.7×,
    * runtime 82×; LshSkewProbe ruled out occupancy skew: 512/512
    * buckets, Σpairs only 1.12× the uniform expectation). Tiles of 128
    * rows (two ~1 MB tile sides, L2-resident) cut vector re-streaming
    * by the tile height; the visit order changes but the visited pair
    * SET and each pair's arithmetic are identical, and the emitted
    * pairs are (i, j)-sorted afterwards so downstream order matches
    * the naive loop exactly.
    */
  private val PairTileRows = 128

  private def bucketPairLoop(
      vecs: Array[Array[Double]],
      threshold: Double
  ): Seq[(Int, Int, Double)] = {
    val n = vecs.length
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      val v = vecs(i)
      var s = 0.0
      var d = 0
      while (d < v.length) { s += v(d) * v(d); d += 1 }
      norms(i) = math.sqrt(s)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
    val T = PairTileRows
    var ti = 0
    while (ti < n) {
      val tiEnd = math.min(ti + T, n)
      var tj = ti
      while (tj < n) {
        val tjEnd = math.min(tj + T, n)
        i = ti
        while (i < tiEnd) {
          val a = vecs(i)
          val na = norms(i)
          var j = math.max(tj, i + 1)
          while (j < tjEnd) {
            val denom = na * norms(j)
            val b = vecs(j)
            if (denom != 0.0 && a.length == b.length) {
              var s = 0.0
              var d = 0
              while (d < a.length) { s += a(d) * b(d); d += 1 }
              val c = s / denom
              if (c >= threshold) out += ((i, j, c))
            }
            j += 1
          }
          i += 1
        }
        tj += T
      }
      ti += T
    }
    out.sortInPlace()(Ordering.Tuple3(Ordering.Int, Ordering.Int, Ordering.Double.TotalOrdering)).toSeq
  }

  /** Within-bucket verified cosine pairs for a (id, v, bkt) frame: one
    * shuffle groups each bucket's members onto one task, then the
    * pairwise verify runs as a LOCAL primitive loop — no join-row
    * materialization. The former fat self-join streamed every
    * candidate pair through the join operator as a wide row (two
    * copied vectors per row: ~pairs × 2·dim·8 bytes of row traffic —
    * the measured 28.8 s at sf10 was this, not the exchange); the
    * grouped loop touches each vector once per bucket and emits only
    * surviving pairs. Bucket population is bounded by the blocking
    * width (adaptive width targets ~4k expected rows ⇒ ~16 MB per
    * group at 1k dims), so group state stays far under task memory;
    * for adversarially skewed sign distributions use
    * [[embeddingNearDupPairsBanded]] whose narrower per-band buckets
    * cap group size harder.
    */
  private def verifiedPairsWithinBuckets(t: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val elemIsFloat = t.schema("v").dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    val tv = if (elemIsFloat) t else t.withColumn("v", col("v").cast("array<double>"))
    // parallel collect_lists aggregate the same per-group input stream,
    // so ids(i) is the id of vs(i)
    val grouped = tv
      .groupBy("bkt")
      .agg(collect_list(col("id")).as("ids"), collect_list(col("v")).as("vs"))
    // Array[Array[...]] parameters, NOT Seq[Seq[...]]: the Seq form
    // boxes every element on access (ArraySeq.apply through a generic
    // Seq) — ~2e9 transient Float boxes at sf100 (2M × 1024 dims),
    // measured as ~13% of bench wall in GC. The Array form deserializes
    // via primitive toFloatArray/toDoubleArray bulk copies.
    val pairUdf =
      if (elemIsFloat)
        udf { (vs: Array[Array[Float]]) =>
          bucketPairLoop(vs.map { v =>
            val a = new Array[Double](v.length)
            var i = 0
            while (i < v.length) { a(i) = v(i).toDouble; i += 1 }
            a
          }, threshold)
        }
      else
        udf { (vs: Array[Array[Double]]) =>
          bucketPairLoop(vs, threshold)
        }
    grouped
      .select(col("ids"), explode(pairUdf(col("vs"))).as("p"))
      .select(
        element_at(col("ids"), col("p._1") + 1).as("ua"),
        element_at(col("ids"), col("p._2") + 1).as("ub"),
        col("p._3").as("cosine"))
      .filter(col("ua") =!= col("ub"))
      .select(
        when(col("ua") < col("ub"), col("ua")).otherwise(col("ub")).as("id_a"),
        when(col("ua") < col("ub"), col("ub")).otherwise(col("ua")).as("id_b"),
        col("cosine"))
  }

  /** Embedding-cosine near-dup pairs over unit vectors, blocked by an
    * LSH-ish sign-bit key of the first `signBits` components (cheap
    * random-hyperplane surrogate given hashed embeddings). Verify with
    * exact cosine, computed per bucket as a local primitive loop (see
    * [[verifiedPairsWithinBuckets]] for why that beats a self-join).
    *
    * The blocking key is PART OF THE SEMANTICS: pairs that disagree on
    * any of the first `signBits` component signs are never compared
    * (standard random-hyperplane LSH recall trade). The default derives
    * the width from the corpus size ([[adaptiveSignBits]]) — more data
    * means finer blocking, the only setting that keeps candidate pairs
    * linear at 100 TB; pin an explicit `signBits` when a reproducible
    * pair set across growing corpora matters more than throughput (the
    * graded q_embed_neardup row pins 4 so its DuckDB oracle can replay
    * the identical key at every scale). When the corpus has many
    * near-dups and recall at the adaptive width matters, use
    * [[embeddingNearDupPairsBanded]] — a single wide band trades
    * recall away quietly as the width grows.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cosineThreshold: Double,
      signBits: Int = AdaptiveBits
  ): DataFrame = {
    require(signBits == AdaptiveBits || signBits > 0, s"signBits must be positive or AdaptiveBits: $signBits")
    val bits = if (signBits == AdaptiveBits) adaptiveSignBits(df.count()) else signBits
    val t = df
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bkt", signKey(col("v"), 0, bits))
    verifiedPairsWithinBuckets(t, cosineThreshold)
  }

  /** Exact all-pairs cosine ≥ threshold — NO blocking, every pair
    * compared. Quadratic by construction: this is the ground-truth
    * oracle for recall grading over a BOUNDED slice (thousands of
    * rows), not a corpus operator. Runs as one grouped primitive loop
    * so even the 8M-pair graded slice costs well under a second.
    */
  def bruteForceCosinePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cosineThreshold: Double
  ): DataFrame =
    verifiedPairsWithinBuckets(
      df.select(col(idCol).as("id"), col(vecCol).as("v")).withColumn("bkt", lit(0L)),
      cosineThreshold)

  /** Banded (multi-probe) sign-bit LSH near-dup pairs: `bands` bands of
    * `bitsPerBand` component signs each (band b keys on components
    * [b·r, (b+1)·r)); docs agreeing on ALL bits of ANY band become
    * candidates, verified with exact cosine. The banded OR is the same
    * recall construction as MinHash LSH banding: a single w-bit band
    * has recall p^w (p = per-bit sign-agreement probability of a true
    * pair), which decays quietly as the adaptive width grows — b bands
    * recover 1 − (1 − p^r)^b.
    *
    * SCALE BOUNDARY (measured, r15): unlike the adaptive route, band
    * width here CANNOT grow with the corpus — bands × bitsPerBand ≤
    * dim, so each band's bucket count is a constant 2^r and expected
    * candidates grow as b·n²/2^r. Linear-ish only while n ≲ 2^r; at
    * the defaults (8×8 over dim 64) a 200k-vector corpus already
    * ENOSPC'd the candidate dedup on a 70 GB-free host
    * (records/probe_r15_embedneardup.log). This operator is the
    * RECALL tool for bounded/shortlisted corpora (its graded row
    * plants a few-thousand-vector slice); at corpus scale use
    * [[embeddingNearDupPairs]], whose adaptive width keeps buckets
    * ∝ n.
    *
    * Scale shape: the band exchange carries ONLY (band, bucket, id) —
    * vectors never ride the candidate join (DedupSpec asserts the
    * bucket exchanges are vector-free). Candidates are deduplicated
    * across bands BEFORE verify, then vectors attach by id — the
    * [[minHashLshPairs]] pattern. Requires dim ≥ bands × bitsPerBand.
    */
  def embeddingNearDupPairsBanded(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cosineThreshold: Double,
      bands: Int = 8,
      bitsPerBand: Int = 8
  ): DataFrame = {
    import graft.functions.VectorFunctions
    require(bands > 0, s"bands must be positive: $bands")
    require(bitsPerBand > 0 && bitsPerBand < 64, s"bitsPerBand must be in [1, 63]: $bitsPerBand")
    val t = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val banded = t.select(
      col("id"),
      posexplode(
        array((0 until bands).map(b => signKey(col("v"), b * bitsPerBand, bitsPerBand)): _*)
      ).as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"))
    val candidates = l
      .join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    candidates
      .join(t.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(t.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cosine") >= cosineThreshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Duplicate-SPAN scrubbing — the token-granular half of
    * "Deduplicating Training Data Makes Language Models Better"
    * (Lee et al. 2022, ExactSubstr): instead of dropping whole
    * documents, remove every token covered by an n-gram that occurs
    * more than once in the corpus (boilerplate headers, license
    * blocks, templated sentences vanish from EVERY copy, including
    * the first). Returns (doc_id, clean_text, n_removed) — clean_text
    * is the surviving token stream (lowercased, single-spaced; the
    * same normalization every gram operator here uses), "" when a doc
    * is scrubbed entirely.
    *
    * 100 TB shape: gram counting is ONE map-side-combinable aggregate;
    * duplicated-gram membership is a semi-join on the gram string; and
    * the rebuild is a SPAN-MERGE — the duplicated-gram start positions
    * aggregate per document (a collect_set bounded by document length),
    * and one sorted walk over them inside a higher-order `aggregate`
    * merges overlapping [start, start+n-1] covers and splices the kept
    * slices out of the already-materialized token array. No per-
    * position explode, no (doc, pos) distinct, no token-stream
    * anti-join: the round-13 form shipped 8 exchange rows per covered
    * gram occurrence plus the full token stream twice, which is what
    * filled the sweep host's disk at sf100 — the span walk ships one
    * integer per duplicated-gram occurrence and nothing else. No
    * windows, no all-pairs: a boilerplate gram shared by 10^8
    * documents costs one reduced count row plus its own occurrences,
    * never a funnel. ExactSubstr proper uses a corpus suffix array to
    * catch arbitrary-length duplicates ≥ 50 tokens; fixed-n grams are
    * its bounded, join-expressible form — any duplicated span ≥ n
    * tokens is fully covered by its n-windows, shorter ones are
    * deliberately kept.
    *
    * `hashPrefilter` — the EXACT 64-bit prefilter on the gram count:
    * collisions can only INFLATE a hash count, so hash-count == 1
    * PROVES a gram unique and hash-count > 1 is an exact superset of
    * the duplicated grams. The dup-hash set then reaches the stream as
    * a broadcast BLOOM filter (~1.2 B/key at 1% fpp) and prunes
    * map-side, so the only string exchange left is the duplicated-ish
    * slice feeding the string-exact count (which eliminates bloom fpp
    * and hash collisions alike); past [[Dedup.ScrubBloomMaxKeys]] dup
    * hashes — a mostly-duplicated corpus — it degrades to the r14
    * semi-join. That trade WINS only when most grams are unique and
    * the stream is big — on a small corpus the extra hash-count pass
    * is pure overhead (it cost the graded row +65% at sf0.1 in round
    * 13) — so the default sizes it from a document count
    * ([[graft.tune.AdaptiveKnobs]] discipline): on above
    * [[Dedup.ScrubPrefilterMinDocs]] documents, off below. Output is
    * bit-identical on every route (spec-pinned).
    *
    * NOTE the default sizing runs `df.count()` EAGERLY at call time —
    * one extra evaluation of the upstream lineage, expensive when `df`
    * is a derived pipeline rather than a raw scan (ADVICE r14).
    * Callers that already know the corpus size (a capped graded slice,
    * a metadata count) should pass `docCountHint` to keep the call
    * fully lazy; an explicit `hashPrefilter` skips the sizing
    * entirely. When the prefilter IS on, this method is eager twice
    * more (ADVICE r15): the hash-count aggregate and the bloom build
    * run as Spark jobs AT CALL TIME (the filter must exist before the
    * returned plan can embed it), so composing a lazy pipeline around
    * this call still pays one tokenize+explode+hash pass up front even
    * if the result is never executed — and the ~1.2 B/key broadcast
    * bloom stays alive for the lifetime of the returned plan (it is
    * referenced from the plan's filter; `spark.cleaner` reclaims it
    * with the plan, or callers can drop the DataFrame early).
    */
  def scrubDuplicateSpans(
      df: DataFrame, idCol: String, textCol: String, n: Int = 8,
      hashPrefilter: Option[Boolean] = None,
      docCountHint: Option[Long] = None,
      bloomMaxKeys: Long = ScrubBloomMaxKeys): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    val arrs = df.select(
      col(idCol).as("doc_id"),
      filter(split(lower(coalesce(col(textCol), lit(""))), "\\s+"), t => length(t) > 0).as("a"))
    val grams = arrs
      .filter(size(col("a")) >= n)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("a")) - (n - 1)),
          i => struct(i.as("start"), concat_ws(" ", slice(col("a"), i, lit(n))).as("g")))).as("sg"))
      .select(col("doc_id"), col("sg.start").as("start"), col("sg.g").as("g"))
    val usePrefilter =
      hashPrefilter.getOrElse(docCountHint.getOrElse(df.count()) > ScrubPrefilterMinDocs)
    val candidates =
      if (!usePrefilter) grams
      else {
        // The r14 form semi-JOINED the duplicated-hash set back into the
        // hashed gram stream — which re-EXCHANGES the full stream,
        // strings included, whenever the dup set outgrows broadcast. The
        // pinned sf100r A/B measured that route at +39% wall-clock,
        // +19% shuffle and +32% spill over no-prefilter (records/
        // probe_r15_scrub_volumes.log): the "8-byte keys" saving never
        // existed because the strings rode the join anyway. The bloom
        // form broadcasts the dup-hash set (~1.2 B/key at 1% fpp, the
        // bloomContainmentPairs pattern) and filters the stream
        // map-side, so the ONLY string exchange left is the duplicated-
        // ish slice feeding the exact count. False positives (bloom fpp
        // + xxhash64 collisions alike) are culled by that exact count —
        // output is bit-identical on every route (spec-pinned).
        // NOTE this route materializes the hash-count aggregate EAGERLY
        // at call time (a count + a bloom-build job) — the bloom must
        // exist before the plan can be constructed.
        val hashed = grams.withColumn("__h", xxhash64(col("g")))
        val dupHashes = hashed.groupBy("__h").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1).select("__h")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nDup = dupHashes.count()
        if (nDup == 0) { // nothing duplicated anywhere: scrub is a no-op
          dupHashes.unpersist(blocking = false)
          grams.limit(0)
        } else if (nDup <= bloomMaxKeys) {
          val bloom = dupHashes.stat.bloomFilter("__h", nDup, 0.01)
          dupHashes.unpersist(blocking = false)
          val bloomB = df.sparkSession.sparkContext.broadcast(bloom)
          // codegen'd probe (graft.functions.BloomMightContain): the
          // filter stays inside the gram stream's whole-stage-codegen
          // span and probes the primitive hash — the r15 boxed-UDF
          // form paid a java.lang.Long allocation + lambda frame per
          // gram (~10^10 at the fourth decade). Deterministic, so the
          // optimizer inlines xxhash64(g) straight into the filter
          // and __h never materializes as a column.
          hashed.filter(
            graft.functions.BloomExpressions.mightContain(col("__h"), bloomB)).drop("__h")
        } else {
          // degenerate corpus (most grams duplicated): a bloom this
          // size would strain broadcast, and pruning buys little when
          // the "slice" is ~the stream — fall back to the semi-join.
          // The cached dupHashes is NOT handed to the lazy plan:
          // CacheManager pins persisted frames for the session
          // lifetime (ContextCleaner never reclaims reachable cache
          // entries), so repeated degenerate calls would accumulate
          // multi-GB pins. Unpersist the sizing cache and let the
          // join recompute the hash aggregate at execution — one
          // extra pass, paid only on the route whose corpus is
          // pathological anyway.
          dupHashes.unpersist(blocking = false)
          val dupHashesLazy = hashed.groupBy("__h").agg(count(lit(1)).as("c"))
            .filter(col("c") > 1).select("__h")
          hashed.join(dupHashesLazy, Seq("__h"), "left_semi").drop("__h")
        }
      }
    val dupGrams = candidates.groupBy("g").agg(count(lit(1)).as("c")).filter(col("c") > 1).select("g")
    // per-doc sorted duplicated-gram starts; each covers [st, st+n-1]
    val dupStarts = candidates
      .join(dupGrams, Seq("g"), "left_semi")
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("start"))).as("ss"))
    // one walk over the sorted starts: pe = end of the merged cover so
    // far (starts ascending ⇒ st+n-1 is monotone, so pe just advances);
    // the kept tokens are the slices strictly between consecutive
    // merged spans plus the tail after the last one
    val kept = aggregate(
      col("ss"),
      struct(lit(0).as("pe"), slice(col("a"), lit(1), lit(0)).as("kept")),
      (acc, st) => struct(
        (st + (n - 1)).as("pe"),
        when(st > acc("pe") + 1,
          concat(acc("kept"), slice(col("a"), acc("pe") + 1, st - acc("pe") - 1)))
          .otherwise(acc("kept")).as("kept")),
      acc => concat(acc("kept"),
        slice(col("a"), acc("pe") + 1, greatest(size(col("a")) - acc("pe"), lit(0)))))
    arrs
      .join(dupStarts, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(col("ss").isNull, col("a")).otherwise(kept).as("__k"),
        size(col("a")).cast("long").as("__nt"))
      .select(
        col("doc_id"),
        concat_ws(" ", col("__k")).as("clean_text"),
        (col("__nt") - size(col("__k")).cast("long")).as("n_removed"))
  }

  /** Document count above which [[scrubDuplicateSpans]] turns its hash
    * prefilter on by default: below it the gram exchange is small
    * enough that the extra hash-count pass costs more than the string
    * bytes it saves (measured +65% on the 5k-doc graded row, round
    * 13); above it the broadcast-bloom prune is what keeps the string
    * exchange down to the duplicated slice at the 10^8-document
    * decades (the r15 sf100r A/B — records/probe_r15_scrub_volumes
    * .log — is the measured crossover evidence).
    */
  val ScrubPrefilterMinDocs: Long = 1L << 20

  /** Duplicated-hash-set size above which [[scrubDuplicateSpans]]'s
    * prefilter abandons the broadcast bloom for a semi-join: 2^26 keys
    * ≈ 80 MB of bloom at 1% fpp, the upper edge of comfortable
    * per-executor broadcast. A dup set that large means the corpus is
    * mostly-duplicated (the maximal-density ScaleUp fixture, not a
    * real crawl), where pruning cannot shrink the stream much anyway.
    */
  val ScrubBloomMaxKeys: Long = 1L << 26
}
