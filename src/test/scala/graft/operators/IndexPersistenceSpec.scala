package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IndexPersistenceSpec extends SparkSpec {
  import spark.implicits._

  test("write/load/searchPruned round-trip equals in-memory search, scan is partition-pruned") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = IvfIndex.seedCentroids(emb, 16)
    val assignments = IvfIndex.assign(emb, cents)
    val dir = Files.createTempDirectory("ivf_index").toString
    IvfIndex.writeIndex(assignments, cents, dir)

    val (loadedCents, loadedAssign) = IvfIndex.loadIndex(spark, dir)
    assert(loadedCents.map(_._1).toSeq == cents.map(_._1).toSeq)

    val q = emb.where($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val pruned = IvfIndex.searchPruned(q, loadedCents, loadedAssign,
      nprobe = 4, k = 10, excludeSelf = true)
      .select($"query_id", $"rank", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inMem = IvfIndex.search(q, cents, assignments,
      nprobe = 4, k = 10, excludeSelf = true)
      .select($"query_id", $"rank", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pruned == inMem && pruned.nonEmpty)

    // the probed-cluster filter must reach the parquet scan as a partition
    // filter (only the probed inverted lists are read)
    val plan = loadedAssign.where($"cluster_id".isin(1L, 2L, 3L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster_id"))
    assert(!plan.split('\n').exists(l => l.contains("PartitionFilters: []")))
  }

  test("addToIndex: incrementally added vectors are found by pruned search") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = IvfIndex.seedCentroids(emb, 16)
    val half1 = emb.where($"vec_id" % 2 === 0)
    val half2 = emb.where($"vec_id" % 2 === 1)
    val dir = Files.createTempDirectory("ivf_add").toString
    IvfIndex.writeIndex(IvfIndex.assign(half1, cents), cents, dir)
    IvfIndex.addToIndex(half2, cents, dir)

    val (loadedCents, loadedAssign) = IvfIndex.loadIndex(spark, dir)
    assert(loadedAssign.count() == emb.count())
    val q = emb.where($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val incremental = IvfIndex.searchPruned(q, loadedCents, loadedAssign,
      nprobe = 4, k = 10, excludeSelf = true)
      .select($"query_id", $"rank", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val oneShot = IvfIndex.search(q, cents, IvfIndex.assign(emb, cents),
      nprobe = 4, k = 10, excludeSelf = true)
      .select($"query_id", $"rank", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(incremental == oneShot && incremental.nonEmpty)
  }

  test("removeIds drops exactly the removal set; search never returns a removed id") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = IvfIndex.seedCentroids(emb, 16)
    val assigned = IvfIndex.assign(emb, cents)
    val rm = emb.where($"vec_id" % 5 === 0).select($"vec_id")
    val removed = IvfIndex.removeIds(assigned, rm)
    assert(removed.count() == emb.count() - rm.count())
    assert(removed.where($"vec_id" % 5 === 0).count() == 0)
    // anti-join must not shuffle the big side: no Exchange above the scan
    // feeding the join's left (broadcast hash join expected)
    val plan = removed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join:\n$plan")

    val q = emb.where($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val res = IvfIndex.search(q, cents, removed, nprobe = 4, k = 10,
      excludeSelf = true).select($"vec_id").as[Long].collect()
    assert(res.nonEmpty && res.forall(_ % 5 != 0))
  }

  test("evenSplitScalable matches the window-based evenSplit assignment") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val viaWindow = Sharding.evenSplit(emb, 7, "vec_id")
      .select($"vec_id", $"shard_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaScale = Sharding.evenSplitScalable(emb, 7, "vec_id")
      .select($"vec_id", $"shard_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaScale == viaWindow)
  }
}
