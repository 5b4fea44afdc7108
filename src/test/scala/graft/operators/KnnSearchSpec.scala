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

  test("selfTopKIp ranks by descending inner product (MIPS), not distance") {
    val emb = Seq(
      (0L, Array(1f, 0f)),   // query
      (1L, Array(3f, 0f)),   // dot 3 — farthest by L2 among candidates, best by IP
      (2L, Array(1f, 1f)),   // dot 1
      (3L, Array(0f, 1f)))   // dot 0
      .toDF("vec_id", "embedding")
    val got = KnnSearch.selfTopKIp(emb, numQueries = 1, k = 3).collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_.getAs[Double]("score")).toSeq == Seq(3.0, 1.0, 0.0))
    // L2 would have ranked 2 before 1 — IP is a genuinely different metric
    val l2 = KnnSearch.selfTopK(emb, numQueries = 1, k = 1).head.getAs[Long]("vec_id")
    assert(l2 == 2L)
  }

  test("selfTopK excludes the query row and returns k rows per query") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val got = KnnSearch.selfTopK(emb, numQueries = 4, k = 5).collect()
    assert(got.length == 20)
    assert(!got.exists(r => r.getAs[Long]("query_id") == r.getAs[Long]("vec_id")))
    assert(got.forall(_.getAs[Double]("dist") > 0.0))
  }

  test("rangeSearch returns exactly the pairs within radiusSq, no window in the plan") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val r2 = 1.5
    val got = KnnSearch.selfRange(emb, numQueries = 4, radiusSq = r2)
    // reference: brute force via the HOF distance (cross-checks the fused
    // expr), filtering on the UNROUNDED distance like the operator does
    val q = emb.where(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val all = emb.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.Distances.l2Sq(col("qvec"), col("embedding")).as("d"))
      .where(col("d") <= r2)
      .select(col("query_id"), col("vec_id"), round(col("d"), 4).as("dist"))
      .orderBy(col("query_id"), col("vec_id"))
    assert(got.collect().toSeq == all.collect().toSeq)
    assert(got.collect().nonEmpty, "radius too small for the fixture")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"range search must not plan a window:\n$plan")
  }
}
