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
    * then runs once instead of twice. The persist is RELEASED before
    * returning: the assigned result is pinned eagerly via localCheckpoint
    * (lineage truncated — later reads can never resample), then the
    * intermediate unpersists, so repeated calls in a long-lived session
    * hold one materialized copy of the result, not an ever-growing pile
    * of MEMORY_AND_DISK intermediates. (Unpersist-without-checkpoint
    * would be wrong, not just slow: a post-release recompute re-plans
    * with fresh RDD ids, so the range sampler may draw DIFFERENT
    * boundaries than the count pass observed → stale offsets → corrupt
    * shard sizes.) Positions stay below 2⁵³ (double-exact long division
    * range) up to ~9×10¹⁵ rows — orders of magnitude past the 100 TB row
    * count. */
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
    val assigned = sorted.withColumn("shard_id", shard.cast("long")).drop("_mid")
      .localCheckpoint(true)
    sorted.unpersist(blocking = false)
    assigned
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

  /** S4 for the content-hash layout: persist the corpus PARTITIONED BY its
    * content-hash shard — one directory per shard, so a routed read can
    * list/scan exactly one of them (partition pruning). */
  def writeShardedIndex(df: DataFrame, vecCol: String, numShards: Int,
      dir: String): Unit =
    withHashShard(df, vecCol, numShards)
      .write.mode("overwrite").partitionBy("shard_id").parquet(dir)

  /** Routed single-shard search — the reference's `all_shards=False`
    * serving path (vector_search_cluster.py:216-221: pick ONE shard via
    * `_route_query`, :361-376, and query only it). Each query routes by
    * the SAME content-hash rule the persisted layout used ([[hashShard]];
    * `numShards` must match the build — caller contract, as with every
    * persisted-index param here), the index read carries a
    * `shard_id IN (routed…)` predicate on the PARTITION column — only the
    * routed shards' directories are listed and scanned (PartitionFilters,
    * plan-gated in PlanShapeSpec) — and the equi-join on shard_id pairs
    * each query with exactly its own shard's vectors.
    *
    * Scale: this is the point of routing — per query batch the scan cost
    * is (distinct routed shards)/numShards of the corpus, not a fan-out
    * to every shard; the query batch is broadcast (request-batch-sized by
    * construction) and the per-shard top-k is the same
    * WindowGroupLimit-on-broadcast shape as the FLAT path. Like the
    * reference, routed search trades recall for that cost: a neighbor
    * living in a different shard is invisible by design. */
  def routedSearch(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      queries: DataFrame,
      numShards: Int,
      k: Int,
      excludeSelf: Boolean = false): DataFrame = {
    val routed = queries.withColumn("shard_id", hashShard(col("qvec"), numShards))
    // bounded collect: one shard id per query in the request batch
    val shards = routed.select(col("shard_id")).distinct()
      .collect().map(_.getLong(0))
    val corpus = spark.read.parquet(indexDir)
      .where(col("shard_id").isin(shards.map(Long.box): _*))
    val joined = corpus.join(broadcast(routed), Seq("shard_id"))
    val filtered =
      if (excludeSelf) joined.where(col("vec_id") =!= col("query_id"))
      else joined
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    filtered
      .select(col("query_id"), col("vec_id"),
        Distances.l2SqFast(col("qvec"), col("embedding")).as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("dist"))
  }

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
