package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("dupClusters: transitive chain collapses to one canonical, singletons self-map") {
    val docs = (1L to 6L).toDF("doc_id")
    // chain 1-2-3 (transitive), pair 4-5, 6 alone
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(docs, pairs).orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, false), (2L, 1L, true), (3L, 1L, true),
      (4L, 4L, false), (5L, 4L, true), (6L, 6L, false)))
  }

  test("dupClusters handles long chains within maxIter via label propagation") {
    val docs = (1L to 10L).toDF("doc_id")
    val pairs = (1L to 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(docs, pairs).collect()
    assert(got.forall(_.getAs[Long]("canonical_id") == 1L))
  }

  test("CosineLsh: buckets deterministic, probe set has P+1 entries, results ranked") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val r = CosineLsh.selfSearch(emb, numQueries = 4, numPlanes = 8, k = 5).collect()
    assert(r.nonEmpty)
    assert(!r.exists(row => row.getAs[Long]("query_id") == row.getAs[Long]("vec_id")))
    val r2 = CosineLsh.selfSearch(emb, numQueries = 4, numPlanes = 8, k = 5).collect()
    assert(r.map(_.toString).toSeq == r2.map(_.toString).toSeq)
  }
}
