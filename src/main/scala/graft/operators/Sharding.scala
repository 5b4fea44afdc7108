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
    * window. Range-repartition on the order key, read per-partition row
    * counts off `monotonically_increasing_id` (partition id in the upper
    * bits, in-partition ordinal in the lower 33), then assign shard ids
    * from global positions in a plain projection — broadcast offset
    * array, whole-stage codegen throughout, no RDD hop, no row
    * conversion.
    *
    * The sorted frame is persisted: range boundaries are SAMPLED, so the
    * count pass and the assignment pass must observe the same
    * partitioning (re-execution could resample), and the shuffle+sort
    * then runs once instead of twice. Storage cost is one materialized
    * copy — the same class as the shuffle files the sort already writes;
    * Spark's cache manager dedupes repeated calls by plan. Positions stay
    * below 2⁵³ (double-exact long division range) up to ~9×10¹⁵ rows —
    * orders of magnitude past the 100 TB row count. */
  def evenSplitScalable(df: DataFrame, numShards: Int, orderCol: String): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val localIdxMask = (1L << 33) - 1
    val sorted = df.repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .withColumn("_mid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val countByPid = sorted
      .groupBy(shiftright(col("_mid"), 33).as("_pid"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1))).toMap
    val offsets = new Array[Long](parts)
    var running = 0L
    var pid = 0
    while (pid < parts) {
      offsets(pid) = running
      running += countByPid.getOrElse(pid, 0L)
      pid += 1
    }
    val total = running
    val base = total / numShards
    val rem = total % numShards
    val cut = rem * (base + 1) // rows before this position land in the first `rem` (larger) shards
    val pos = element_at(typedLit(offsets.toSeq),
      shiftright(col("_mid"), 33).cast("int") + 1) +
      (col("_mid").bitwiseAND(lit(localIdxMask)))
    val shard = when(pos < lit(cut), floor(pos / lit(base + 1)))
      .otherwise(floor((pos - lit(cut)) / lit(math.max(base, 1L))) + lit(rem))
    sorted.withColumn("shard_id", shard.cast("long")).drop("_mid")
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
