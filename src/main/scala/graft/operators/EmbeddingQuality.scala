package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Embedding-space data curation: flag vectors that sit abnormally far
  * from their own class centroid — the standard mislabeled-sample /
  * corrupted-embedding pruning step of a training-data pipeline (the
  * vector analog of the text quality gate).
  *
  * Determinism note: centroids use the ROUNDED per-dim means
  * ([[EmbeddingPool.meanPool]]'s round(avg, 4)) so the centroid — and
  * therefore every distance — is bit-identical across engines and
  * partitionings; a raw double mean would differ in the last ulps by
  * fold order and break oracle hashing.
  *
  * Scale: the centroid table is labels×d rows (control-plane) →
  * broadcast; the distance is a map-side projection; the per-label
  * mean/stddev of distances is one map-combinable aggregate over
  * labels-many groups, broadcast back. The corpus streams through
  * twice, never shuffles.
  */
object EmbeddingQuality {

  /** Per-label centroid as one array<double> row per label (rounded
    * per-dim means, ascending dim). */
  def labelCentroidArrays(embeddings: DataFrame): DataFrame =
    EmbeddingPool.meanPool(embeddings, "label")
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("mean")))),
        s => s.getField("mean")).as("centroid"))

  /** Distance of every vector to its own label centroid, flagged
    * against a per-label z-score threshold: outlier ⟺
    * dist > mean_dist + z·stddev_samp(dist). Output:
    * (vec_id, label, dist, is_outlier), ordered by vec_id. */
  def outliers(embeddings: DataFrame, z: Double): DataFrame = {
    val cents = labelCentroidArrays(embeddings)
    val scored = embeddings
      .join(broadcast(cents), Seq("label"))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        Distances.l2Sq(col("embedding"), col("centroid")).as("dist"))
    val stats = scored.groupBy(col("label"))
      .agg(avg(col("dist")).as("mean_dist"),
        stddev_samp(col("dist")).as("sd_dist"))
    scored.join(broadcast(stats), Seq("label"))
      .select(col("vec_id"), col("label"),
        round(col("dist"), 4).as("dist"),
        (col("dist") > col("mean_dist") + lit(z) * col("sd_dist")).as("is_outlier"))
      .orderBy(col("vec_id"))
  }

  /** Per-label centroid drift between two corpus halves (vec_id parity
    * split — any deterministic split works): L2 distance between the
    * halves' rounded per-dim centroids. The embedding-space analog of
    * the reference's operational monitoring (distribution drift between
    * ingest batches). Exact across engines for the same reason as
    * [[outliers]] — rounded means. */
  def labelDrift(embeddings: DataFrame): DataFrame = {
    def half(parity: Int) =
      EmbeddingPool.meanPool(
        embeddings.where(pmod(col("vec_id"), lit(2)) === parity), "label")
        .select(col("label"), col("dim"), col("mean"), col("n"))
    half(0).as("a").join(half(1).as("b"), Seq("label", "dim"))
      .groupBy(col("label"))
      .agg(
        round(sqrt(sum(pow(col("a.mean") - col("b.mean"), 2))), 4).as("drift"),
        (max(col("a.n")) + max(col("b.n"))).as("n_vecs"))
      .select(col("label").cast("long").as("label"), col("drift"), col("n_vecs"))
      .orderBy(col("label"))
  }
}
