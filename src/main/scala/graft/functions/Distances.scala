package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance / similarity column functions.
  *
  * The reference's only metric is (squared) L2 — every FAISS index it builds
  * is rooted at `IndexFlatL2` (vector_search_cluster.py:1021, 1025, 1028,
  * 1034, 1039, 1044) and FAISS reports *squared* L2 distances from `search`
  * (vector_search_cluster.py:593). We reproduce that convention and extend
  * with inner-product / cosine (SURVEY §2.10).
  *
  * All arithmetic is double-precision with a left-to-right fold over the
  * array so results are bit-reproducible against the DuckDB oracle
  * (FIXTURES.md oracle conventions). Built entirely from codegen'd SQL
  * higher-order functions — no UDFs (SURVEY §2.7 F1).
  */
object Distances {

  /** Cast a float array column to double elementwise (keeps FP math in
    * double from the first operation, matching the oracle). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Squared Euclidean distance — the FAISS `IndexFlatL2` metric
    * (no sqrt, per vector_search_cluster.py:593 semantics). */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean (root) distance. */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Fused codegen squared-L2 (graft.plans.L2SqDistance): bit-identical to
    * [[l2Sq]], ~several× faster on wide vectors — use in hot search paths. */
  def l2SqFast(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.L2SqDistance(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Fused codegen inner product — bit-identical to [[dot]]. */
  def dotFast(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.DotProduct(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Inner product. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm of a single vector. */
  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]. Zero-norm inputs follow ANSI Divide
    * semantics (throw under ANSI, NULL otherwise) — the fused
    * [[cosineSimFast]] matches BOTH modes by design
    * (`L2SqDistanceSpec`'s zero-norm contract). */
  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Cosine distance = 1 - cosine similarity. */
  def cosineDist(a: Column, b: Column): Column =
    lit(1.0) - cosineSim(a, b)

  /** Codegen cosine similarity — bit-identical to [[cosineSim]], one
    * array pass (dot + both norms in a single fused loop) instead of
    * three. */
  def cosineSimFast(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.CosineSim(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Codegen cosine distance — bit-identical to [[cosineDist]]. */
  def cosineDistFast(a: Column, b: Column): Column =
    lit(1.0) - cosineSimFast(a, b)

  /** Sum of vector elements (double) — the reference's shard-hash input
    * `np.sum(vec)` (vector_search_cluster.py:375, 1202). */
  def elementSum(v: Column): Column =
    aggregate(toDouble(v), lit(0.0), (acc, x) => acc + x)

  /** Dimension check — validation the reference lacks (SURVEY §1.3). */
  def hasDim(v: Column, d: Int): Column = size(v) === d
}
