package graft.text

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Greedy in-order sequence packing — the step between a curated
  * corpus and a token-budgeted training set: documents are packed, in
  * a deterministic order, into blocks of at most `budget` cost units
  * (tokens); a document that would overflow the open block starts a
  * new one. An oversize document (cost > budget) gets a block of its
  * own and the next document starts fresh — emitted, not dropped, so
  * the caller can decide to split or discard it.
  *
  * Packing is ORDER-DEPENDENT, which makes it inherently sequential
  * WITHIN its ordering domain — that is the operator's real 100 TB
  * shape, not a limitation to engineer around: a training pipeline
  * packs within a shard/domain (so block membership is stable under
  * re-runs and independent of cluster size), never across the whole
  * corpus (a global pack order would serialize the world AND make
  * every block boundary depend on every earlier byte). So: ONE
  * shuffle to co-locate each group, a sort within partitions, and a
  * single sequential pass per group; groups pack in parallel. A
  * pathologically hot group serializes only itself; when in-group
  * order is free the caller splits it with `subShards > 1`
  * (deterministic md5 sub-sharding of the order key — block ids then
  * live per (group, shard)).
  *
  * No window functions: a running-sum-with-reset is not expressible
  * as a frame aggregate, and faking it with a window would funnel
  * each group through the window machinery anyway without giving the
  * reset. The per-partition pass IS the operator.
  */
object SequencePacking {

  /** Pack rows of `df` into blocks of at most `budget` total
    * `costCol`, in ascending `orderCol` order within each `groupCol`
    * group. Returns (groupCol, orderCol, costCol, block_id,
    * block_pos): block ids count from 0 per group (per (group,
    * sub-shard) when `subShards > 1`), block_pos from 0 per block.
    */
  def packGreedy(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      costCol: String,
      budget: Long,
      subShards: Int = 1): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(subShards >= 1, s"subShards must be >= 1, got $subShards")
    val spark = df.sparkSession
    val shard =
      if (subShards == 1) lit(0)
      else pmod(Sampling.hashBucket(col(orderCol)), lit(subShards)).cast("int")
    val narrow = df.select(
      col(groupCol).cast("string").as("g"),
      shard.as("sh"),
      col(orderCol).cast("long").as("o"),
      col(costCol).cast("long").as("c"))
    val outSchema = StructType(Seq(
      StructField("g", StringType), StructField("sh", IntegerType),
      StructField("o", LongType), StructField("c", LongType),
      StructField("block_id", IntegerType), StructField("block_pos", IntegerType)))
    val packed = narrow
      .repartition(col("g"), col("sh"))
      .sortWithinPartitions(col("g"), col("sh"), col("o"))
      .mapPartitions { it =>
        var curG: String = null
        var curSh = Int.MinValue
        var acc = 0L
        var blockId = 0
        var blockPos = 0
        it.map { r =>
          if (r.isNullAt(2) || r.isNullAt(3))
            throw new IllegalArgumentException(
              s"packGreedy requires non-null order and cost columns, got $r")
          val g = r.getString(0); val sh = r.getInt(1)
          val o = r.getLong(2); val c = r.getLong(3)
          if (g != curG || sh != curSh) { curG = g; curSh = sh; acc = 0L; blockId = 0; blockPos = 0 }
          if (acc > 0L && acc + c > budget) { blockId += 1; blockPos = 0; acc = 0L }
          acc += c
          val row = Row(g, sh, o, c, blockId, blockPos)
          blockPos += 1
          row
        }
      }(Encoders.row(outSchema))
    val renamed = packed.select(
      col("g").as(groupCol), col("sh").as("shard"), col("o").as(orderCol),
      col("c").as(costCol), col("block_id"), col("block_pos"))
    if (subShards == 1) renamed.drop("shard") else renamed
  }
}
