package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WhiteningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("jacobiEigen: eigenvectors are orthonormal and satisfy A·u = λ·u") {
    // small symmetric fixture with distinct eigenvalues
    val a = Array(
      Array(4.0, 1.0, 0.5),
      Array(1.0, 3.0, 0.2),
      Array(0.5, 0.2, 2.0))
    val (lam, u) = Whitening.jacobiEigen(a)
    for (k <- 0 until 3) {
      // residual ||A u_k - lam_k u_k||
      val res = (0 until 3).map { i =>
        val av = (0 until 3).map(j => a(i)(j) * u(j)(k)).sum
        math.abs(av - lam(k) * u(i)(k))
      }.max
      assert(res < 1e-10, s"eigenpair $k residual $res")
      for (l <- k until 3) {
        val dot = (0 until 3).map(i => u(i)(k) * u(i)(l)).sum
        val expect = if (k == l) 1.0 else 0.0
        assert(math.abs(dot - expect) < 1e-10)
      }
    }
  }

  test("whitened sample covariance is the identity (diag 1, off-diag 0)") {
    val (mu, w) = Whitening.fit(emb)
    val rows = Whitening.whiten(emb, mu, w)
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
    val n = rows.length
    val d = rows.head.length
    val mean = new Array[Double](d)
    rows.foreach(r => (0 until d).foreach(j => mean(j) += r(j)))
    (0 until d).foreach(j => mean(j) /= n)
    var maxDiagErr = 0.0
    var maxOffErr = 0.0
    // spot-check a grid of entries (full d² loop is slow in a test)
    for (a <- 0 until d by 7; b <- a until d by 7) {
      var s = 0.0
      rows.foreach(r => s += (r(a) - mean(a)) * (r(b) - mean(b)))
      val cov = s / (n - 1)
      if (a == b) maxDiagErr = math.max(maxDiagErr, math.abs(cov - 1.0))
      else maxOffErr = math.max(maxOffErr, math.abs(cov))
    }
    assert(maxDiagErr < 1e-2, s"diag err $maxDiagErr")
    assert(maxOffErr < 1e-2, s"off-diag err $maxOffErr")
  }

  test("whitening is deterministic and composes with PQ search (recall sanity)") {
    val (mu1, w1) = Whitening.fit(emb)
    val (mu2, w2) = Whitening.fit(emb)
    assert(mu1.toSeq == mu2.toSeq && w1.flatten.toSeq == w2.flatten.toSeq)
    val truth = KnnSearch.selfTopK(emb, numQueries = 8, k = 10)
    val white = Whitening.whiten(emb, mu1, w1)
    val pq = PqIndex.selfSearchSeeded(white, numQueries = 8, m = 8,
      subDim = 8, ksub = 16, k = 10)
    // whitening changes the metric (that is its purpose) — the gate is
    // that the composed index still retrieves a meaningful share of the
    // raw-space truth on the isotropic fixture
    assert(AnnEval.meanRecall(pq, truth) > 0.2)
  }
}
