package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnnEvalSpec extends SparkSpec {
  import spark.implicits._

  test("recallCounts measures per-query set overlap") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "vec_id")
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (2L, 7L))
      .toDF("query_id", "vec_id")
    val got = AnnEval.recallCounts(approx, exact).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (2L, 3L)) // 10,12 hit; 99 isn't in exact, doesn't count
    assert(got(2L) == (0L, 2L))
  }

  test("recall of a result against itself is 1.0") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val flat = KnnSearch.selfTopK(emb, numQueries = 4, k = 5)
    assert(AnnEval.meanRecall(flat, flat) == 1.0)
  }

  test("meanRecall on empty ground truth is 0.0") {
    val empty = Seq.empty[(Long, Long)].toDF("query_id", "vec_id")
    assert(AnnEval.meanRecall(empty, empty) == 0.0)
  }

  test("quantErrorReport: 32 rows per family, non-negative, coarser rungs err more") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val r = AnnEval.quantErrorReport(emb, fromVec = 64, numVecs = 32,
      d = 64, m = 16, subDim = 4, ksub = 32).cache()
    val counts = r.groupBy($"family").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(counts === Map("sq8" -> 32L, "sq4" -> 32L, "pq" -> 32L))
    assert(r.where($"sse" < 0).count() === 0)
    val means = r.groupBy($"family").agg(avg($"sse").as("m")).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    // 4-bit grid is coarser than 8-bit; the ordering is the whole point
    assert(means("sq4") > means("sq8"))
    // a disjoint slice must not reconstruct exactly from seed codewords
    assert(means("pq") > 0.0)
    r.unpersist()
  }
}
