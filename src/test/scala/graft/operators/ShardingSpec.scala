package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  test("evenSplit: every row in exactly one shard, sizes differ by <= 1, remainder first") {
    val df = (0L until 103L).toDF("vec_id")
    val sizes = Sharding.evenSplit(df, 5, "vec_id")
      .groupBy($"shard_id").count().orderBy($"shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sizes.map(_._2).sum == 103)
    assert(sizes.map(_._2).max - sizes.map(_._2).min <= 1)
    // 103 = 5*20 + 3 → first 3 shards get 21 (vector_search_cluster.py:1011)
    assert(sizes.map(_._2).toSeq == Seq(21L, 21L, 21L, 20L, 20L))
  }

  test("hashShard lands in [0, n) and is deterministic") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val ids = Sharding.withHashShard(emb, "embedding", 16)
      .select($"shard_id").distinct().as[Long].collect()
    assert(ids.forall(s => s >= 0 && s < 16))
    val a = Sharding.withHashShard(emb, "embedding", 16)
      .select($"vec_id", $"shard_id").collect().toSet
    val b = Sharding.withHashShard(emb, "embedding", 16)
      .select($"vec_id", $"shard_id").collect().toSet
    assert(a == b)
  }

  test("shardMetadata totals match input") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val sharded = Sharding.withHashShard(emb, "embedding", 8)
    val meta = Sharding.shardMetadata(sharded, "FLAT", 64).collect()
    assert(meta.map(_.getAs[Long]("num_vectors")).sum == emb.count())
    assert(meta.forall(_.getAs[String]("index_type") == "FLAT"))
  }
}
