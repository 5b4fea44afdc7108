package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The size-gated literal forms must be value-identical: per-element
  * literal arrays (small nlist — fastest codegen) vs the single encoded
  * literal (large nlist — O(1) codegen size). Forcing litMax = 0 drives
  * every centroid/codebook through the large-scale path on the same data,
  * so the assert covers the exact plan shape used past the gate. */
class LiteralGateSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("IVF assign: single-literal form row-identical to per-element form") {
    val cents = IvfIndex.seedCentroids(emb, 16)
    val small = IvfIndex.assignHof(emb, cents)
      .select(col("vec_id"), col("cluster_id")).orderBy(col("vec_id")).collect()
    val large = IvfIndex.assignHof(emb, cents, litMax = 0)
      .select(col("vec_id"), col("cluster_id")).orderBy(col("vec_id")).collect()
    assert(small.sameElements(large))
  }

  test("fused CentroidArgmin is row-identical to the HOF assignment") {
    val cents = IvfIndex.seedCentroids(emb, 16)
    val fused = IvfIndex.assign(emb, cents)
      .select(col("vec_id"), col("cluster_id")).orderBy(col("vec_id")).collect()
    val hof = IvfIndex.assignHof(emb, cents)
      .select(col("vec_id"), col("cluster_id")).orderBy(col("vec_id")).collect()
    assert(fused.sameElements(hof))
  }

  test("IVF probes: single-literal form row-identical to per-element form") {
    val cents = IvfIndex.seedCentroids(emb, 16)
    val q = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    def run(litMax: Int) = IvfIndex.probes(q, cents, nprobe = 4, litMax = litMax)
      .select(col("query_id"), col("cluster_id"))
      .orderBy(col("query_id"), col("cluster_id")).collect()
    assert(run(Int.MaxValue).sameElements(run(0)))
  }

  test("PQ encode + LUT: single-literal form row-identical to per-element form") {
    val cb = PqIndex.seedCodebooks(emb, m = 16, subDim = 4, ksub = 16)
    def codes(litMax: Int) = emb
      .select(col("vec_id"),
        PqIndex.encodeExprHof(col("embedding"), cb, 16, 4, litMax).as("codes"))
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(codes(Int.MaxValue).sameElements(codes(0)))
    def lut(litMax: Int) = emb.where(col("vec_id") < 4)
      .select(col("vec_id"),
        PqIndex.lutExpr(col("embedding"), cb, 16, 4, litMax).as("lut"))
      .orderBy(col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getSeq[Seq[Double]](1)))
    assert(lut(Int.MaxValue).sameElements(lut(0)))
  }

  test("fused PqEncode is row-identical to the HOF encode on real vectors") {
    val cb = PqIndex.seedCodebooks(emb, m = 16, subDim = 4, ksub = 16)
    val both = emb.select(
      PqIndex.encodeExpr(col("embedding"), cb, 16, 4).as("fast"),
      PqIndex.encodeExprHof(col("embedding"), cb, 16, 4).as("hof"))
    assert(both.where(not(col("fast") <=> col("hof"))).count() == 0)
  }
}
