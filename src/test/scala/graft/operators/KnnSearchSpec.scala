package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KnnSearchSpec extends SparkSpec {
  import spark.implicits._

  test("topK on tiny literal data: exact distances and ranks") {
    // queries: q0 at origin; vectors at distance² 1, 4, 25
    val queries = Seq((0L, Array(0f, 0f))).toDF("query_id", "qvec")
    val vectors = Seq(
      (10L, Array(1f, 0f)),   // d² = 1
      (11L, Array(0f, 2f)),   // d² = 4
      (12L, Array(3f, 4f)))   // d² = 25
      .toDF("vec_id", "vec")
    val got = KnnSearch.topK(queries, vectors, k = 2)
      .orderBy($"rank").collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(10L, 11L))
    assert(got.map(_.getAs[Double]("dist")).toSeq == Seq(1.0, 4.0))
  }

  test("ties broken by vec_id") {
    val queries = Seq((0L, Array(0f, 0f))).toDF("query_id", "qvec")
    val vectors = Seq(
      (7L, Array(1f, 0f)), (3L, Array(0f, 1f)), (5L, Array(-1f, 0f)))
      .toDF("vec_id", "vec")
    val got = KnnSearch.topK(queries, vectors, k = 3).orderBy($"rank").collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(3L, 5L, 7L))
  }

  test("selfTopK excludes the query row and returns k rows per query") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val got = KnnSearch.selfTopK(emb, numQueries = 4, k = 5).collect()
    assert(got.length == 20)
    assert(!got.exists(r => r.getAs[Long]("query_id") == r.getAs[Long]("vec_id")))
    assert(got.forall(_.getAs[Double]("dist") > 0.0))
  }
}
