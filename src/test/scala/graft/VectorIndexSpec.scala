package graft

import graft.VectorIndex._

class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  test("every index family answers the same self-search contract") {
    val specs: Seq[(String, IndexSpec)] = Seq(
      "flat" -> Flat,
      "ivf" -> Ivf(nlist = 16, nprobe = 4, trained = false),
      "pq" -> Pq(m = 8, subDim = 8, ksub = 16),
      "ivfpq" -> IvfPq(nlist = 8, nprobe = 2, m = 8, subDim = 8, ksub = 16),
      "ivfpq_trained" -> IvfPq(nlist = 8, nprobe = 2, m = 8, subDim = 8, ksub = 16,
        trained = true),
      "hnsw" -> Hnsw(),
      "vamana" -> Vamana(numPartitions = 4),
      "opq" -> Opq(m = 8, subDim = 8, ksub = 16, iters = 2),
      "opq_ivfpq" -> OpqIvfPq(nlist = 8, nprobe = 2, m = 8, subDim = 8, ksub = 16, iters = 2),
      "ivf_hnsw" -> IvfHnsw(nlist = 16, nprobe = 4))
    specs.foreach { case (name, spec) =>
      val r = selfSearch(emb, numQueries = 2, k = 5, spec)
      val rows = r.collect()
      assert(rows.nonEmpty, name)
      // the shared contract is the leading (query_id, rank, vec_id, dist);
      // learned-transform families append their model fingerprint column
      // (OPQ's probe0_sq) after it
      assert(r.columns.take(4).toSeq == Seq("query_id", "rank", "vec_id", "dist"), name)
      assert(rows.forall(_.getAs[Long]("rank") <= 5), name)
    }
  }

  test("flat through the facade equals KnnSearch directly") {
    val a = selfSearch(emb, 4, 5, Flat).collect().map(_.toString).toSeq
    val b = graft.operators.KnnSearch.selfTopK(emb, 4, 5).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
