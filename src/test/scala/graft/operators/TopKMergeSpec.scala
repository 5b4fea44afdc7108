package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKMergeSpec extends SparkSpec {
  import spark.implicits._

  test("merge of per-shard partial top-k equals global top-k (A1 invariant)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val merged = TopKMerge.shardedSelfTopK(emb, numQueries = 6, k = 8, numShards = 4)
      .select($"query_id", $"rank", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val global = KnnSearch.selfTopK(emb, numQueries = 6, k = 8)
      .select($"query_id", $"rank", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == global)
  }

  test("merge drops error rows and composes global ids") {
    val partials = Seq(
      (0L, 0L, 10L, 1.0, null.asInstanceOf[String]),
      (0L, 1L, 11L, 0.5, null.asInstanceOf[String]),
      (0L, 2L, 12L, 0.1, "boom")) // error shard → dropped (P4)
      .toDF("query_id", "shard_id", "vec_id", "dist", "error")
    val got = TopKMerge.merge(partials, k = 2).orderBy($"rank").collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(11L, 10L))
    val gid = got.head.getAs[org.apache.spark.sql.Row]("global_id")
    assert(gid.getLong(0) == 1L && gid.getLong(1) == 11L)
  }
}
