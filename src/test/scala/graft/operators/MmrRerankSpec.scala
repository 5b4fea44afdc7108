package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MmrRerankSpec extends SparkSpec {
  import spark.implicits._

  // hand-checkable candidate geometry for one query: two near-identical
  // relevant vectors and one orthogonal less-relevant one — pure
  // relevance picks the twins first; MMR at λ=0.5 must interleave the
  // orthogonal vector at rank 2
  private def cands = Seq(
    (1L, 10L, 0.90, Array(1f, 0f)),
    (1L, 11L, 0.89, Array(1f, 0.001f)), // twin of 10
    (1L, 12L, 0.50, Array(0f, 1f)))
    .toDF("query_id", "vec_id", "rel", "vec")

  test("pure relevance (λ=1) reproduces the rel ordering") {
    val got = MmrRerank.rerank(cands, lam = 1.0, m = 3).collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(10L, 11L, 12L))
    assert(got.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    assert(got.head.getAs[Double]("score") == 0.90)
  }

  test("diversity term demotes the near-duplicate twin") {
    val got = MmrRerank.rerank(cands, lam = 0.5, m = 3).collect()
    // rank1: highest rel (10). rank2: 11 scores 0.5*0.89 − 0.5*cos(11,10)
    // ≈ 0.445 − 0.4999 < 0; 12 scores 0.5*0.5 − 0.5*0 = 0.25 → 12 wins.
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(10L, 12L, 11L))
  }

  test("negative cross-similarities are not floored at zero") {
    // candidate 21 points AWAY from pick 20 (cos = −1): its MMR score
    // must be boosted by the negative max-sim, beating 22 (orthogonal)
    val c = Seq(
      (1L, 20L, 0.9, Array(1f, 0f)),
      (1L, 21L, 0.10, Array(-1f, 0f)),  // cos to 20 = −1
      (1L, 22L, 0.12, Array(0f, 1f)))   // cos to 20 = 0
      .toDF("query_id", "vec_id", "rel", "vec")
    val got = MmrRerank.rerank(c, lam = 0.5, m = 2).collect()
    // 21: 0.5*0.10 − 0.5*(−1) = 0.55 ; 22: 0.5*0.12 − 0 = 0.06
    assert(got.map(_.getAs[Long]("vec_id")).toSeq == Seq(20L, 21L))
    assert(got.last.getAs[Double]("score") == 0.55)
  }

  test("m caps at the candidate count and ranks stay dense per query") {
    val got = MmrRerank.rerank(cands, lam = 0.7, m = 10).collect()
    assert(got.length == 3)
    assert(got.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
  }

  test("end-to-end selfRerank: picks are a diverse subset of the top-n candidates") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val got = MmrRerank.selfRerank(emb, numQueries = 2, n = 8, m = 4, lam = 0.7)
    val rows = got.collect()
    assert(rows.length == 8) // 2 queries × 4 picks
    // every pick must come from that query's cosine top-8
    val topn = KnnSearch.selfTopK(emb, numQueries = 2, k = 8,
        dist = graft.functions.Distances.cosineDistFast)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)].collect().toSet
    rows.foreach { r =>
      assert(topn.contains((r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))))
    }
    // rank-1 pick IS the cosine top-1 (empty-set MMR = pure relevance)
    val top1 = KnnSearch.selfTopK(emb, numQueries = 2, k = 1,
        dist = graft.functions.Distances.cosineDistFast)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)].collect().toMap
    rows.filter(_.getAs[Long]("rank") == 1L).foreach { r =>
      assert(top1(r.getAs[Long]("query_id")) == r.getAs[Long]("vec_id"))
    }
  }
}
