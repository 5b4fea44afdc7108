package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Recall harness for the approximate paths (SURVEY §5.2): ANN results are
  * scored against our own DuckDB-verified FLAT output — recall@k =
  * |ANN ∩ exact| / |exact|, averaged over the query set. */
class IvfPqRecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()
  private lazy val exact = KnnSearch.selfTopK(emb, numQueries = 8, k = 10)
    .select($"query_id", $"vec_id").cache()

  private def recall(ann: DataFrame): Double = {
    val hits = ann.select($"query_id", $"vec_id").join(exact, Seq("query_id", "vec_id")).count()
    hits.toDouble / exact.count()
  }

  test("trained IVF recall@10 >= 0.85 at nprobe=nlist/4") {
    val r = recall(IvfIndex.selfSearchTrained(emb, numQueries = 8, nlist = 32, nprobe = 12, k = 10))
    info(f"IVF trained recall@10 = $r%.3f")
    assert(r >= 0.85)
  }

  test("seeded IVF recall@10 reasonable at nprobe=4/16") {
    val r = recall(IvfIndex.selfSearchSeeded(emb, numQueries = 8, nlist = 16, nprobe = 4, k = 10))
    info(f"IVF seeded recall@10 = $r%.3f")
    assert(r >= 0.5)
  }

  test("trained PQ raw-ADC recall@10 >= 0.35 (synthetic gaussians bound PQ hard)") {
    val r = recall(PqIndex.selfSearchTrained(emb, numQueries = 8, m = 8, subDim = 8, ksub = 64, k = 10))
    info(f"PQ trained recall@10 = $r%.3f")
    assert(r >= 0.35)
  }

  test("PQ with exact re-rank of ADC shortlist recall@10 >= 0.8") {
    val r = recall(PqIndex.selfSearchReranked(emb, numQueries = 8,
      m = 8, subDim = 8, ksub = 64, k = 10, shortlist = 50))
    info(f"PQ reranked recall@10 = $r%.3f")
    assert(r >= 0.8)
  }

  // seeded (untrained) centroids + 2/8 pruning on clusterless gaussian
  // data bound recall hard; semantics are oracle-verified (q_ivfpq_knn),
  // quality paths are the trained/reranked specs above
  test("combined IVFPQ (residual encoding) recall@10 >= 0.2 at nprobe=2/8") {
    val r = recall(IvfPqIndex.selfSearchSeeded(emb, numQueries = 8,
      nlist = 8, nprobe = 2, m = 8, subDim = 8, ksub = 16, k = 10))
    info(f"IVFPQ residual recall@10 = $r%.3f")
    assert(r >= 0.2)
  }

  test("IVF at full probe count equals exact search") {
    val full = IvfIndex.selfSearchSeeded(emb, numQueries = 8, nlist = 16, nprobe = 16, k = 10)
    assert(recall(full) == 1.0)
  }
}
