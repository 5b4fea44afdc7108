package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ZCA whitening of the embedding space — the decorrelation pre-stage
  * (FAISS exposes the same idea as `PCAMatrix(d, d, 0, true)`): center,
  * then multiply by W = U·diag(1/√(λ+ε))·Uᵀ so the transformed sample
  * has identity covariance. Whitening before PQ balances per-subspace
  * variance like OPQ's learned rotation, and before cosine/L2 search it
  * equalizes dominant directions (Mahalanobis-izes the metric).
  *
  * The model (d-dim mean + d×d matrix) is fit on a bounded sample (the
  * KMeans/PQ/PCA first-batch rule — O(sample) cost) with a plain
  * driver-side Jacobi eigensolver — deterministic, no library RNG — and
  * applied as centering (`zip_with` float subtract) feeding the fused
  * by-value [[graft.plans.MatVec]]: a pure map-side projection, no join,
  * no shuffle, O(1) plan size at any corpus scale. Like PCA/IVF
  * training, the learned model is not SQL-reproducible → spec-gated
  * (whitened covariance ≈ I), the same verification class as trained
  * IVF/HNSW/PCA.
  */
object Whitening {

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * returns (eigenvalues, eigenvectors as columns). Deterministic. */
  private[operators] def jacobiEigen(
      sym: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = sym.length
    val m = sym.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-22) {
      off = 0.0
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) {
          off += m(p)(q) * m(p)(q)
          if (math.abs(m(p)(q)) > 1e-18) {
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * m(p)(q))
            val sign = if (theta >= 0) 1.0 else -1.0
            val t = sign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val mkp = m(k)(p); val mkq = m(k)(q)
              m(k)(p) = c * mkp - s * mkq
              m(k)(q) = s * mkp + c * mkq
              k += 1
            }
            k = 0
            while (k < d) {
              val mpk = m(p)(k); val mqk = m(q)(k)
              m(p)(k) = c * mpk - s * mqk
              m(q)(k) = s * mpk + c * mqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => m(i)(i)), v)
  }

  /** Sample moments + eigendecomposition shared by [[fit]] and
    * [[fitStats]]: (n, d, mu, cov, eigenvalues, eigenvectors). */
  private def fitEigen(embeddings: DataFrame, sampleN: Int):
      (Int, Int, Array[Double], Array[Array[Double]], Array[Double], Array[Array[Double]]) = {
    // deterministic sample: first-N by id (TakeOrderedAndProject, no global sort)
    val rows = embeddings.orderBy(col("vec_id")).limit(sampleN)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val n = rows.length
    val d = rows.head.length
    val mu = new Array[Double](d)
    rows.foreach { r =>
      var j = 0
      while (j < d) { mu(j) += r(j); j += 1 }
    }
    var j = 0
    while (j < d) { mu(j) /= n; j += 1 }
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      var a = 0
      while (a < d) {
        val xa = r(a) - mu(a)
        var b = a
        while (b < d) { cov(a)(b) += xa * (r(b) - mu(b)); b += 1 }
        a += 1
      }
    }
    var a = 0
    while (a < d) {
      var b = a
      while (b < d) {
        cov(a)(b) /= (n - 1)
        cov(b)(a) = cov(a)(b)
        b += 1
      }
      a += 1
    }
    val (lam, u) = jacobiEigen(cov)
    (n, d, mu, cov, lam, u)
  }

  /** Fit (mean, W) on a bounded sample. `eps` regularizes near-zero
    * eigenvalues (rank-deficient directions are left ~unscaled instead
    * of exploding). */
  def fit(embeddings: DataFrame, sampleN: Int = 10000,
      eps: Double = 1e-6): (Array[Float], Array[Array[Float]]) = {
    val (_, d, mu, _, lam, u) = fitEigen(embeddings, sampleN)
    // W = U diag(1/sqrt(lam+eps)) U^T  (ZCA: symmetric, stays in-basis)
    val w = Array.ofDim[Double](d, d)
    var a = 0
    while (a < d) {
      var b = 0
      while (b < d) {
        var s = 0.0
        var k = 0
        while (k < d) {
          s += u(a)(k) * u(b)(k) / math.sqrt(math.max(lam(k), 0.0) + eps)
          k += 1
        }
        w(a)(b) = s
        b += 1
      }
      a += 1
    }
    (mu.map(_.toFloat), w.map(_.map(_.toFloat)))
  }

  /** Drift fingerprint for the q_whiten_stats oracle query: one row of
    * (n, d, cov_trace, eigen_sum) from the SAME fit the model uses. The
    * DuckDB oracle recomputes the trace as the sum of per-dimension
    * sample variances over the identical first-N-by-id sample and emits
    * it for BOTH columns — so the hash compare verifies (a) the sample
    * selection and covariance accumulation, and (b) that the Jacobi
    * eigendecomposition conserves total variance (Σλ = tr(C), the
    * similarity invariant): a silent drift in either fails an exact
    * compare instead of only the covariance≈I spec. 4dp rounding rides
    * ~1e-12 relative agreement — far from any boundary. */
  def fitStats(embeddings: DataFrame, sampleN: Int = 10000): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (n, d, _, cov, lam, _) = fitEigen(embeddings, sampleN)
    val trace = (0 until d).map(i => cov(i)(i)).sum
    val eigenSum = lam.sum
    Seq((n.toLong, d.toLong,
      BigDecimal(trace).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(eigenSum).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n", "d", "cov_trace", "eigen_sum")
  }

  /** Whitening projection: W · (x − μ), centering in float (storage
    * precision), product accumulated in double via the fused MatVec. */
  def whitenExpr(vec: Column, mu: Array[Float], w: Array[Array[Float]]): Column =
    Rotation.rotateExpr(
      zip_with(vec, typedLit(mu.toSeq), (x, m) => x - m), w)

  /** Whiten an embeddings table in place (embedding column replaced). */
  def whiten(embeddings: DataFrame, mu: Array[Float],
      w: Array[Array[Float]]): DataFrame =
    embeddings.withColumn("embedding", whitenExpr(col("embedding"), mu, w))
}
