package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HnswIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  test("HNSW recall@10 >= 0.9 vs exact FLAT at reference params") {
    val exact = KnnSearch.selfTopK(emb, numQueries = 8, k = 10)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = HnswIndex.selfSearch(emb, numQueries = 8, k = 10, numPartitions = 4)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann intersect exact).size.toDouble / exact.size
    info(f"HNSW recall@10 = $recall%.3f")
    assert(recall >= 0.9)
  }

  test("output shape: k rows per query, ranked, self excluded, deterministic") {
    val a = HnswIndex.selfSearch(emb, numQueries = 4, k = 5, numPartitions = 4).collect()
    val b = HnswIndex.selfSearch(emb, numQueries = 4, k = 5, numPartitions = 4).collect()
    assert(a.length == 20)
    assert(!a.exists(r => r.getAs[Long]("query_id") == r.getAs[Long]("vec_id")))
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
