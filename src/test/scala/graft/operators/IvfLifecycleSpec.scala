package graft

import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** FAISS-style index lifecycle: merge_from, reconstruct, and the
  * imbalance_factor diagnostic (reference monitors list balance to decide
  * retraining). */
class IvfLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val cents = IvfIndex.seedCentroids(emb, 8)

  test("mergeFrom of disjoint halves searches identically to the full index") {
    val full = IvfIndex.assign(emb, cents)
    val merged = IvfIndex.mergeFrom(
      IvfIndex.assign(emb.where(pmod($"vec_id", lit(2L)) === 0L), cents),
      IvfIndex.assign(emb.where(pmod($"vec_id", lit(2L)) === 1L), cents))
    val q = emb.where($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val a = IvfIndex.search(q, cents, full, nprobe = 2, k = 5, excludeSelf = true)
      .select($"query_id", $"rank", $"vec_id")
    val b = IvfIndex.search(q, cents, merged, nprobe = 2, k = 5, excludeSelf = true)
      .select($"query_id", $"rank", $"vec_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("reconstruct returns the stored vectors for the requested ids") {
    val assignments = IvfIndex.assign(emb, cents)
    val ids = emb.where($"vec_id" % 17 === 0).select($"vec_id")
    val out = IvfIndex.reconstruct(assignments, ids)
    val expected = emb.join(ids, Seq("vec_id"))
    assert(out.count() === expected.count())
    // every reconstructed vector equals the original embedding
    val mismatches = out.select($"vec_id", $"embedding".as("rec"))
      .join(emb.select($"vec_id", $"embedding".as("orig")), Seq("vec_id"))
      .where($"rec" =!= $"orig").count()
    assert(mismatches === 0L)
  }

  test("indexStats computes imbalance = 1.0 for perfectly balanced lists") {
    val synthetic = spark.range(40)
      .select($"id".as("vec_id"), pmod($"id", lit(4L)).as("cluster_id"))
    val stats = IvfIndex.indexStats(synthetic, nlist = 4)
      .as[(Long, Long, Long, Double)].head()
    assert(stats === ((4L, 4L, 40L, 1.0)))
  }

  test("indexStats flags skewed lists with imbalance > 1") {
    val skewed = spark.range(40)
      .select($"id".as("vec_id"),
        when($"id" < 37, 0L).otherwise($"id" - 36L).as("cluster_id"))
    val stats = IvfIndex.indexStats(skewed, nlist = 4)
      .as[(Long, Long, Long, Double)].head()
    assert(stats._2 === 4L && stats._3 === 40L && stats._4 > 3.0)
  }
}
