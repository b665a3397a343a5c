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
    */
  def exactDedup(df: DataFrame, textCol: String, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col("__h")).orderBy(orderCols.map(col): _*)
    df.withColumn("__h", contentHash(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__h", "__rn")
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

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over the shingle set of xxhash64(shingle, seed). Pure
    * Column expressions — codegen'd, no UDF, no shuffle.
    */
  def minHashSignature(shinglesCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shinglesCol, s => xxhash64(s, lit(seed))))
    }: _*)

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
      .withColumn("sh", array_distinct(shingles(col("text"), shingleSize)))
      .withColumn("sig", minHashSignature(col("sh"), numHashes))

    // band hash: one bucket key per band = hash of that signature slice
    val banded = base
      .select(
        col("id"),
        col("sh"),
        posexplode(
          array((0 until bands).map(b => hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*)
        ).as(Seq("band", "bucket"))
      )

    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = l
      .join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard", jaccardExpr(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select("id_a", "id_b", "jaccard")
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
    val t = df.select(
      col(idCol).as("id"),
      col(blockCol).as("block"),
      array_distinct(split(normalizedText(col(textCol)), " ")).as("toks")
    )
    val a = t.select(col("block"), col("id").as("id_a"), col("toks").as("t_a"))
    val b = t.select(col("block"), col("id").as("id_b"), col("toks").as("t_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccardExpr(col("t_a"), col("t_b")))
      .filter(col("jaccard") >= threshold)
      .select("block", "id_a", "id_b", "jaccard")
  }

  /** SimHash: 64-bit signature where bit i is the sign of the sum over
    * tokens of (token-hash bit i ? +1 : -1). Near-dups have small
    * Hamming distance. Pure Column expressions via bit arithmetic.
    */
  def simHash(textCol: Column): Column = {
    val toks = split(normalizedText(textCol), " ")
    val hashes = transform(toks, t => xxhash64(t))
    // for each bit, count tokens with that bit set; bit set in result if count*2 > n
    val n = size(toks)
    val bitCols = (0 until 64).map { i =>
      val cnt = aggregate(
        hashes,
        lit(0L),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(lit(1L))
      )
      when(cnt * 2 > n.cast("long"), shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on the 4 16-bit sub-bands (any exact
    * band match → candidate; a pair within Hamming distance 3 must
    * match at least one of 4 bands by pigeonhole), verify by full
    * Hamming distance.
    */
  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3
  ): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))
    val banded = sigs.select(
      col("id"),
      col("sig"),
      posexplode(
        array((0 until 4).map(b => shiftright(col("sig"), b * 16).bitwiseAND(lit(0xffffL))): _*)
      ).as(Seq("band", "bucket"))
    )
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hammingDistance(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding-cosine near-dup pairs over unit vectors, blocked by an
    * LSH-ish sign-bit key of the first `signBits` components (cheap
    * random-hyperplane surrogate given hashed embeddings). Verify with
    * exact cosine.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      cosineThreshold: Double,
      signBits: Int = 8
  ): DataFrame = {
    import graft.functions.VectorFunctions
    val key = (0 until signBits)
      .map(i => when(element_at(col("v"), i + 1) >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << i))
      .reduce(_ + _)
    val t = df.select(col(idCol).as("id"), col(vecCol).as("v")).withColumn("bkt", key)
    val a = t.select(col("bkt"), col("id").as("id_a"), col("v").as("v_a"))
    val b = t.select(col("bkt"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bkt"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cosine") >= cosineThreshold)
      .select("id_a", "id_b", "cosine")
  }
}
