package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Late-interaction retrieval (ColBERT-style MaxSim): score a query
  * against a document as Σ_i max_j ⟨q_i, v_j⟩ over the two sides' token
  * sub-vectors — retrieval where each side is a SET of vectors and the
  * interaction happens at scoring time, not at embedding time. The
  * fixture's single d-dim embedding is reinterpreted as m contiguous
  * sub-vectors of d/m dims (the same subspace slicing PQ uses —
  * vector_search_cluster.py:1037 m=d/4), which exercises the exact
  * MaxSim plan shape a true multi-vector table would use; with a real
  * token-vectors column the slicing projection is simply dropped.
  *
  * Plan shape: identical to FLAT MIPS — broadcast query set, map-side
  * scoring, `WindowGroupLimit` descending top-k — so the 100 TB story
  * is the FLAT one (corpus streams partition-parallel, Q×k×partitions
  * rows shuffle). MaxSim costs m² dots per pair; the production-scale
  * path composes with any candidate generator (IVF cells, LSH buckets,
  * BM25 shortlist) by substituting the candidate DataFrame for the full
  * corpus — the scorer is candidate-source-agnostic.
  */
object LateInteraction {

  /** Slice a d-dim vector into m sub-vectors of `subDim` dims. */
  private def subVecs(vec: Column, m: Int, subDim: Int): Column =
    transform(sequence(lit(0), lit(m - 1)),
      i => slice(vec, i * subDim + 1, lit(subDim)))

  /** MaxSim score between two sub-vector arrays: Σ over query subs of
    * the max dot product against any document sub. Fold order is
    * ascending i (query side), matching the oracle's list_sum; the dot
    * itself is the fused ascending-j double accumulation
    * ([[Distances.dotFast]]), bit-identical to the DuckDB snippet. */
  def maxSim(qsubs: Column, vsubs: Column): Column =
    aggregate(qsubs, lit(0.0),
      (acc, qi) => acc + array_max(transform(vsubs, vj => Distances.dotFast(qi, vj))))

  /** The production-scale composition the Scaladoc above describes, made
    * concrete: IVF cells generate the candidate set (seeded coarse
    * quantizer — deterministic, oracle-able) and MaxSim scores ONLY the
    * candidates, so the m² dot cost applies to the nprobe/nlist corpus
    * fraction instead of every pair. This is ColBERT's own serving
    * architecture (ANN candidate generation → exact late-interaction
    * re-score). Plan shape: the probe set broadcasts against the
    * assignment table (partition-prunable when persisted, exactly like
    * [[IvfIndex.search]]), scoring is map-side, top-k per query desc. */
  def selfSearchShortlisted(
      embeddings: DataFrame,
      numQueries: Int,
      m: Int,
      subDim: Int,
      nlist: Int,
      nprobe: Int,
      k: Int): DataFrame = {
    val cents = IvfIndex.seedCentroids(embeddings, nlist)
    val assignments = IvfIndex.assign(embeddings, cents)
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cand = assignments
      .join(broadcast(IvfIndex.probes(q, cents, nprobe)), Seq("cluster_id"))
      .where(col("vec_id") =!= col("query_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    cand
      .select(col("query_id"), col("vec_id"),
        maxSim(subVecs(col("qvec"), m, subDim),
          subVecs(col("embedding"), m, subDim)).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("score"), 4).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Self-search: first `numQueries` rows (by id) score against the
    * whole table under MaxSim, descending, ties by vec_id. Output:
    * (query_id, rank, vec_id, score). */
  def selfSearch(
      embeddings: DataFrame,
      numQueries: Int,
      m: Int,
      subDim: Int,
      k: Int): DataFrame = {
    val sliced = embeddings.select(col("vec_id"),
      subVecs(col("embedding"), m, subDim).as("subs"))
    val q = sliced.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("subs").as("qsubs"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    sliced.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        maxSim(col("qsubs"), col("subs")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("score"), 4).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }
}
