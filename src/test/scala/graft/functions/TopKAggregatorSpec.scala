package graft.functions

import graft.SparkSpec
import graft.operators.KnnSearch

class TopKAggregatorSpec extends SparkSpec {

  test("UDAF top-k equals the window top-k row for row") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val viaWindow = KnnSearch.selfTopK(emb, numQueries = 6, k = 8)
      .collect().map(_.toString).toSeq
    val viaAgg = KnnSearch.selfTopKViaAgg(emb, numQueries = 6, k = 8)
      .collect().map(_.toString).toSeq
    assert(viaAgg == viaWindow)
  }

  test("aggregator semantics: bounded buffer, correct merge order") {
    val agg = new TopKAggregator(3)
    val b1 = Seq((5.0, 1L), (1.0, 2L), (3.0, 3L), (7.0, 4L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(b1 == Seq((1.0, 2L), (3.0, 3L), (5.0, 1L)))
    val b2 = Seq((2.0, 9L), (0.5, 8L)).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.finish(agg.merge(b1, b2))
    assert(merged == Seq((0.5, 8L), (1.0, 2L), (2.0, 9L)))
    // tie on dist breaks by id
    val tied = agg.finish(Seq((1.0, 7L), (1.0, 3L), (1.0, 5L), (0.9, 9L))
      .foldLeft(agg.zero)(agg.reduce))
    assert(tied == Seq((0.9, 9L), (1.0, 3L), (1.0, 5L)))
  }
}
