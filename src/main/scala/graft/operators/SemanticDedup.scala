package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances
import graft.operators.IvfIndex.Centroid

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
  * deduplication of an embedding corpus: cluster the embeddings, then
  * within each cluster mark every vector cosine-similar (≥ tau) to a
  * lower-id vector as a duplicate, keeping the lowest id of each
  * semantic group as its representative. The web-scale recipe for
  * pruning paraphrases/re-renders that exact and MinHash dedup miss
  * (same meaning, different tokens).
  *
  * Scale design: the quadratic comparison is confined WITHIN clusters —
  * with nlist ∝ n (the IVF sizing rule) expected cell size is constant,
  * so candidate pairs grow linearly with the corpus, never O(n²).
  * Assignment reuses the IVF shuffle-free codegen argmin
  * (graft.plans.CentroidArgmin); the within-cell self-join shuffles each
  * side once on cluster_id (AQE skew-splits a hot cell); the verdict is
  * one aggregation over the pair list. Exactly the SemDeDup paper's
  * k-means-then-pairwise shape, as three relational stages.
  */
object SemanticDedup {

  /** Within-cluster near-duplicate pairs: (cluster_id, vec_a, vec_b,
    * cos_sim) with vec_a < vec_b and cos_sim ≥ tau (rounded to 4dp —
    * threshold applied to the rounded value, so the cut is
    * engine-portable). */
  def dupPairs(embeddings: DataFrame, centroids: Array[Centroid],
      tau: Double): DataFrame =
    pairsFromAssigned(IvfIndex.assign(embeddings, centroids), tau)

  /** Pair stage over an already-assigned table — both join sides are the
    * SAME subplan shuffled on cluster_id, so Spark plans a
    * ReusedExchange: the corpus is scanned and shuffled once, not twice. */
  private def pairsFromAssigned(assignedIn: DataFrame, tau: Double): DataFrame = {
    val assigned = assignedIn
      .select(col("vec_id"), col("embedding"), col("cluster_id"))
    assigned.as("a").join(assigned.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.cluster_id").as("cluster_id"),
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(Distances.cosineSimFast(col("a.embedding"), col("b.embedding")), 4)
          .as("cos_sim"))
      .where(col("cos_sim") >= tau)
  }

  /** The paper's actual recipe: cluster with k-means (A2's bounded-sample
    * MLlib training) rather than seeded centroids, then the same
    * within-cluster pair/verdict stages. The registry's oracle query
    * stays on [[IvfIndex.seedCentroids]] (deterministic, hash-matched);
    * THIS path is what a production SemDeDup run uses, and
    * SemanticDedupSpec gates its dup-set agreement with the seeded path
    * on a clustered fixture. */
  def verdictsTrained(embeddings: DataFrame, nlist: Int, tau: Double,
      seed: Long = 42L): DataFrame =
    verdicts(embeddings, IvfIndex.trainCentroids(embeddings, nlist, seed), tau)

  /** Per-vector keep/remove verdict: is_dup ⟺ some lower-id vector in
    * the same cluster has cosine ≥ tau. Output (vec_id, cluster_id,
    * is_dup) — one row per input vector. */
  def verdicts(embeddings: DataFrame, centroids: Array[Centroid],
      tau: Double): DataFrame = {
    val assigned = IvfIndex.assign(embeddings, centroids)
    val dups = pairsFromAssigned(assigned, tau)
      .select(col("vec_b").as("vec_id")).distinct()
      .withColumn("is_dup", lit(true))
    assigned.select(col("vec_id"), col("cluster_id"))
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }
}
