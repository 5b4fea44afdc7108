package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Random orthogonal rotation of the embedding space — the FAISS
  * `RandomRotationMatrix` / `IndexPreTransform` pre-stage (and the
  * initialization of OPQ): rotating before product quantization spreads
  * variance evenly across PQ subspaces, which is the cheap version of
  * OPQ's learned rotation and the standard fix for PQ on
  * correlated-dimension embeddings.
  *
  * The matrix is a seeded Gaussian orthonormalized by modified
  * Gram–Schmidt — deterministic (java.util.Random's algorithm is
  * specified), computed once on the driver (d×d doubles — model-sized,
  * like centroids/codebooks), and applied as the by-value
  * [[graft.plans.MatVec]] map-side projection: no join, no shuffle, at
  * any corpus size. Orthogonality ⇒ L2 distances are preserved (up to
  * float32 storage rounding), so exact search in the rotated space
  * returns the same neighbors — spec-asserted, and the rotated search is
  * DuckDB-oracle-checkable with the matrix inlined as literals (same
  * trick as the CosineLsh planes).
  */
object Rotation {

  /** Seeded random orthogonal d×d matrix (rows orthonormal): Gaussian
    * entries, modified Gram–Schmidt in double precision, stored float32
    * (the FAISS transform-matrix storage type). */
  def randomOrthogonal(d: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    val m = Array.fill(d, d)(rnd.nextGaussian())
    var i = 0
    while (i < d) {
      var k = 0
      while (k < i) {
        var dot = 0.0
        var j = 0
        while (j < d) { dot += m(i)(j) * m(k)(j); j += 1 }
        j = 0
        while (j < d) { m(i)(j) -= dot * m(k)(j); j += 1 }
        k += 1
      }
      var nrm = 0.0
      var j = 0
      while (j < d) { nrm += m(i)(j) * m(i)(j); j += 1 }
      nrm = math.sqrt(nrm)
      j = 0
      while (j < d) { m(i)(j) /= nrm; j += 1 }
      i += 1
    }
    m.map(_.map(_.toFloat))
  }

  /** Apply a transform matrix to a float-vector column (map-side,
    * by-value matrix — [[graft.plans.MatVec]]). */
  def rotateExpr(vec: Column, mat: Array[Array[Float]]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.MatVec(ColumnBridge.expression(vec), mat))
  }

  /** Exact L2 self-search in the rotated space — same query protocol as
    * the FLAT path; by orthogonality this returns the same neighbor sets
    * as un-rotated search (modulo float32 rounding on near-ties). */
  def selfSearchRotated(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int,
      seed: Long = 42L): DataFrame = {
    val d = embeddings.select(col("embedding")).head().getSeq[Float](0).length
    val rot = embeddings.select(col("vec_id"),
      rotateExpr(col("embedding"), randomOrthogonal(d, seed)).as("rvec"))
    val q = rot.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("rvec").as("qvec"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    rot.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.Distances.l2SqFast(col("qvec"), col("rvec")).as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Rotate-then-PQ search (the OPQ-shaped composition, seeded codebook
    * variant): PQ runs on the rotated vectors, exact re-rank happens in
    * the rotated space too — recall-gated in specs like the other
    * trained/approximate paths. */
  def rotatedPqSearch(
      embeddings: DataFrame,
      numQueries: Int,
      m: Int,
      subDim: Int,
      ksub: Int,
      k: Int,
      seed: Long = 42L): DataFrame = {
    val d = m * subDim
    val rot = embeddings.select(col("vec_id"),
      rotateExpr(col("embedding"), randomOrthogonal(d, seed)).as("embedding"))
    PqIndex.selfSearchSeeded(rot, numQueries, m, subDim, ksub, k)
  }
}
