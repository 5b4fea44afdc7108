package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class IvfSqIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("IVF-SQ8 probes the same cells as plain IVF (quantization only reorders within candidates)") {
    val ivf = IvfIndex.selfSearchSeeded(emb, numQueries = 4, nlist = 8, nprobe = 8, k = 1000)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfsq = IvfSqIndex.selfSearchSeeded(emb, numQueries = 4, nlist = 8, d = 64,
        nprobe = 8, k = 1000)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // nprobe = nlist → both scan every cell; candidate sets identical
    assert(ivf == ivfsq)
  }

  test("IVF-SQ8 recall@10 vs exact FLAT stays high at 4x compression") {
    val exact = KnnSearch.selfTopK(emb, numQueries = 8, k = 10)
    val approx = IvfSqIndex.selfSearchSeeded(emb, numQueries = 8, nlist = 8, d = 64,
      nprobe = 8, k = 10)
    val recall = AnnEval.meanRecall(approx, exact)
    assert(recall >= 0.9, s"recall $recall")
  }

  test("IVF-SQ4 probes the same cells as IVF-SQ8; packed recall degrades gracefully") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val sq8 = IvfSqIndex.selfSearchSeeded(emb, numQueries = 4, nlist = 8,
        d = 64, nprobe = 8, k = 10)
      .select($"query_id", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq4 = IvfSqIndex.selfSearchSeeded4(emb, numQueries = 4, nlist = 8,
        d = 64, nprobe = 8, k = 10)
      .select($"query_id", $"vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val agree = (sq8 intersect sq4).size.toDouble / sq8.size
    assert(agree >= 0.5, s"full-probe SQ4 vs SQ8 top-10 agreement $agree")
  }

  test("compressed inverted lists carry codes, not embeddings") {
    val cents = IvfIndex.seedCentroids(emb, 8)
    val (vmin, scale) = SqIndex.trainMinMax(emb, 64)
    val codes = IvfSqIndex.buildCodes(emb, cents, vmin, scale)
    assert(!codes.columns.contains("embedding"),
      "inverted lists must store codes, not the raw vectors")
    assert(Set("vec_id", "cluster_id", "codes").subsetOf(codes.columns.toSet))
    val row = codes.head()
    assert(row.getSeq[Long](row.fieldIndex("codes")).forall(c => c >= 0 && c <= 255))
  }
}
