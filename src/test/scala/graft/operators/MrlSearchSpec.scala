package graft.operators

import graft.SparkSpec

class MrlSearchSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("with shortlist = corpus, coarse-to-fine equals exact FLAT top-k") {
    val n = emb.count().toInt
    val mrl = MrlSearch.selfSearch(emb, numQueries = 4, coarseDims = 16,
      shortlist = n, k = 10).collect().map(_.toSeq).toSeq
    val flat = KnnSearch.selfTopK(emb, numQueries = 4, k = 10)
      .collect().map(_.toSeq).toSeq
    assert(mrl == flat)
  }

  test("with a small shortlist, recall@10 vs FLAT stays high") {
    // the fixture is isotropic noise — the prefix carries no privileged
    // signal, so this needs a longer prefix than real MRL embeddings would
    val mrl = MrlSearch.selfSearch(emb, numQueries = 8, coarseDims = 48,
      shortlist = 60, k = 10)
    val flat = KnnSearch.selfTopK(emb, numQueries = 8, k = 10)
    val hits = AnnEval.meanRecall(mrl, flat)
    assert(hits >= 0.85, s"coarse-to-fine recall@10 = $hits")
  }
}
