package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF + scalar quantization — the `IndexIVFScalarQuantizer` composition:
  * coarse cells give partition-pruned candidate scans ([[IvfIndex]]),
  * SQ8 codes give 4× smaller inverted lists ([[SqIndex]]), candidates
  * rank by decoded L2².
  *
  * Encoding is against GLOBAL per-dimension bounds (not per-cell
  * residuals): one (vmin, scale) model serves every cell, so encode and
  * decode stay shuffle-free map-side work and the whole path stays
  * deterministic — exactly oracle-checkable, like [[SqIndex]] and unlike
  * the recall-gated trained paths. (FAISS's residual option buys a bit
  * of accuracy per cell at the cost of per-cell models; the PQ residual
  * fidelity path already exists in [[IvfPqIndex]].)
  *
  * Scale design: probes broadcast (Q×nprobe rows) against the codes
  * table exactly as IVF search does — with a `partitionBy(cluster_id)`
  * layout the scan reads only probed cells, and each cell is 4× smaller
  * than the raw embedding layout; the big side never shuffles.
  */
object IvfSqIndex {

  /** Compressed inverted lists: (vec_id, cluster_id, codes). */
  def buildCodes(embeddings: DataFrame, cents: Array[IvfIndex.Centroid],
      vmin: Array[Double], scale: Array[Double]): DataFrame =
    IvfIndex.assign(embeddings, cents)
      .withColumn("codes", SqIndex.encodeExpr(col("embedding"), vmin, scale))
      .drop("embedding")

  /** IVF + PACKED SQ4 (`IndexIVFScalarQuantizer(QT_4bit)`): the same
    * composition at the 8× rung — probed cells carry nibble-packed
    * codes ([[SqIndex.encode4Expr]]), candidates rank by the unpacking
    * distance fold. Same determinism/oracle story; the inverted lists
    * halve again vs IVF-SQ8. */
  def selfSearchSeeded4(
      embeddings: DataFrame,
      numQueries: Int,
      nlist: Int,
      d: Int,
      nprobe: Int,
      k: Int): DataFrame = {
    val cents = IvfIndex.seedCentroids(embeddings, nlist)
    val (vmin, scale) = SqIndex.trainMinMax4(embeddings, d)
    val codes = IvfIndex.assign(embeddings, cents)
      .withColumn("codes4", SqIndex.encode4Expr(col("embedding"), vmin, scale))
      .drop("embedding")
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val p = IvfIndex.probes(q, cents, nprobe)
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    codes
      .join(broadcast(p), Seq("cluster_id"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        SqIndex.sq4Dist(col("qvec"), col("codes4"), d, vmin, scale).as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** End-to-end IVF-SQ8 self-search with deterministic seed centroids —
    * same query protocol as the other index paths. */
  def selfSearchSeeded(
      embeddings: DataFrame,
      numQueries: Int,
      nlist: Int,
      d: Int,
      nprobe: Int,
      k: Int): DataFrame = {
    val cents = IvfIndex.seedCentroids(embeddings, nlist)
    val (vmin, scale) = SqIndex.trainMinMax(embeddings, d)
    val codes = buildCodes(embeddings, cents, vmin, scale)
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val p = IvfIndex.probes(q, cents, nprobe)
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    codes
      .join(broadcast(p), Seq("cluster_id"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        SqIndex.sqDist(col("qvec"), col("codes"), d, vmin, scale).as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }
}
