package graft.operators

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
}
