package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RotationSpec extends SparkSpec {
  import spark.implicits._

  test("randomOrthogonal rows are orthonormal (R·Rᵀ = I within 1e-5)") {
    val r = Rotation.randomOrthogonal(16, seed = 7L).map(_.map(_.toDouble))
    for (i <- 0 until 16; k <- i until 16) {
      val dot = (0 until 16).map(j => r(i)(j) * r(k)(j)).sum
      val expect = if (i == k) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-5, s"row $i · row $k = $dot")
    }
  }

  test("deterministic: same seed, same matrix") {
    val a = Rotation.randomOrthogonal(8, 42L)
    val b = Rotation.randomOrthogonal(8, 42L)
    assert(a.flatten.toSeq == b.flatten.toSeq)
  }

  test("rotation preserves L2 distances: rotated exact search = FLAT search") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .where(col("vec_id") < 500)
    val rotated = Rotation.selfSearchRotated(emb, numQueries = 4, k = 10)
      .select(col("query_id"), col("rank"), col("vec_id"))
    val flat = KnnSearch.selfTopK(emb, numQueries = 4, k = 10)
      .select(col("query_id"), col("rank"), col("vec_id"))
    // neighbor identity AND order survive the rotation (float32 storage
    // rounding can only reorder exact ties, and vec_id breaks those)
    assert(rotated.exceptAll(flat).isEmpty && flat.exceptAll(rotated).isEmpty)
  }

  test("rotateExpr keeps vector norms (isometry) within float tolerance") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(100)
    val r = Rotation.randomOrthogonal(64, 42L)
    val diffs = emb.select(
      abs(sqrt(graft.functions.Distances.dotFast(col("embedding"), col("embedding"))) -
        sqrt(graft.functions.Distances.dotFast(
          Rotation.rotateExpr(col("embedding"), r),
          Rotation.rotateExpr(col("embedding"), r)))).as("d"))
      .agg(max(col("d"))).head.getDouble(0)
    assert(diffs < 1e-4, s"max norm drift $diffs")
  }

  test("rotated PQ is a working index: recall@10 vs FLAT in the same class as plain PQ") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val truth = KnnSearch.selfTopK(emb, numQueries = 8, k = 10)
    val plain = PqIndex.selfSearchSeeded(emb, numQueries = 8, m = 8,
      subDim = 8, ksub = 16, k = 10)
    val rot = Rotation.rotatedPqSearch(emb, numQueries = 8, m = 8,
      subDim = 8, ksub = 16, k = 10)
    val rPlain = AnnEval.meanRecall(plain, truth)
    val rRot = AnnEval.meanRecall(rot, truth)
    // the isotropic fixture gives rotation nothing to balance — the gate
    // is that rotation COMPOSES correctly, not that it helps here
    assert(rRot >= rPlain - 0.15, s"rotated $rRot vs plain $rPlain")
    assert(rRot > 0.2)
  }
}
