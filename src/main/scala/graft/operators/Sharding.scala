package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Vector sharding / partitioning operators — the Spark rendition of the
  * reference's shard-assignment paths (SURVEY §2.8 D1-D3, §2.7 F7).
  *
  * At scale the shard id is a plain column: downstream writers use
  * `write.partitionBy("shard_id")` and readers get partition pruning for
  * single-shard routing (reference `all_shards=False`,
  * vector_search_cluster.py:216-221) for free.
  */
object Sharding {

  /** D2 — even contiguous split with remainder: N rows into n shards,
    * first N % n shards one row larger (vector_search_cluster.py:1004-1015).
    * The reference randomly shuffles first (unseeded, :1001-1002); we order
    * by a deterministic key instead — same balance property, reproducible.
    * ntile() implements the exact same remainder rule. */
  def evenSplit(df: DataFrame, numShards: Int, orderCol: String): DataFrame =
    df.withColumn(
      "shard_id",
      (ntile(numShards).over(Window.orderBy(col(orderCol))) - 1).cast("long"))

  /** Scale form of [[evenSplit]]: identical assignment (same remainder
    * rule over the same total order) without the single-partition global
    * window — range-repartition on the order key, count rows per
    * partition (one tiny collect), then assign shard ids from global row
    * positions map-side. Two linear passes, no global shuffle to one task. */
  def evenSplitScalable(df: DataFrame, numShards: Int, orderCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val sorted = df.repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val rdd = sorted.rdd
    val counts = rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last
    val base = total / numShards
    val rem = total % numShards
    val cut = rem * (base + 1) // rows before this position land in the first `rem` (larger) shards
    val withShard = rdd.mapPartitionsWithIndex { case (i, it) =>
      var pos = offsets(i)
      it.map { row =>
        val s = if (base == 0 || pos < cut) pos / (base + 1) else (pos - cut) / base + rem
        pos += 1
        Row.fromSeq(row.toSeq :+ s)
      }
    }
    spark.createDataFrame(withShard,
      StructType(sorted.schema.fields :+ StructField("shard_id", LongType, nullable = false)))
  }

  /** D3/F7 — content-hash shard: `int(sum(vec)) % n`, the builder path
    * (vector_search_cluster.py:1199-1212). Reproduced exactly, except the
    * sum is a double left-to-right fold rather than NumPy float32 pairwise
    * summation (documented divergence, SURVEY §7.4) — deterministic and
    * oracle-reproducible. Truncation toward zero matches Python int(). */
  def hashShard(vec: Column, numShards: Int): Column =
    pmod(Distances.elementSum(vec).cast("long"), lit(numShards.toLong))

  /** Assign shard ids by content hash (the coordinator's routing property:
    * deterministic shard in [0, n) from vector content alone). */
  def withHashShard(df: DataFrame, vecCol: String, numShards: Int): DataFrame =
    df.withColumn("shard_id", hashShard(col(vecCol), numShards))

  /** S5 — shards metadata summary (shards_metadata.json,
    * vector_search_cluster.py:1056-1066): one row per shard plus totals.
    * Timestamp intentionally omitted for determinism. */
  def shardMetadata(sharded: DataFrame, indexType: String, dim: Int): DataFrame =
    sharded
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("num_vectors"))
      .select(
        col("shard_id"),
        col("num_vectors"),
        lit(indexType).as("index_type"),
        lit(dim.toLong).as("dimension"))
      .orderBy(col("shard_id"))
}
