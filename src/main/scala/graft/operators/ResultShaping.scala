package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Result shaping for vector search — the serving-layer features modern
  * vector stores bolt onto raw top-k (Milvus `group_by_field`, Vespa
  * grouping, Elastic search facets): group-capped ranking and facet
  * histograms. The reference returns raw (id, distance) lists
  * (vector_search_cluster.py:324-356); these operators are the
  * relational post-passes a serving tier runs on top.
  *
  * Scale: both operators ride the FLAT scoring plan ([[KnnSearch]] —
  * broadcast queries, map-side distances, WindowGroupLimit top-k). The
  * group cap adds ONE extra window keyed (query_id, group): Spark
  * executes it as a partial per-partition bounded heap (≤ m rows per
  * (q,g) per partition survive) before the exchange, so the shuffle
  * carries candidate-bounded rows, never the corpus; the global top-k
  * then runs over ≤ Q×|groups|×m survivors. Facet counting is a plain
  * two-level aggregate over a Q×k-row edge table — control-plane work.
  */
object ResultShaping {

  /** Group-diversified top-k (Milvus search `group_by`): rank candidates
    * per query by distance, keep at most `perGroup` hits per group
    * (perGroup = 1 ⇒ best hit per group — Milvus's exact semantics),
    * then the global top-k of the survivors. Output: (query_id, rank,
    * vec_id, group, dist) with rank dense 1..k over survivors. */
  def groupedTopK(
      queries: DataFrame,
      candidates: DataFrame,
      k: Int,
      perGroup: Int,
      groupCol: String = "group",
      dist: (Column, Column) => Column = Distances.l2SqFast,
      excludeSelf: Boolean = false): DataFrame = {
    val joined = candidates.crossJoin(broadcast(queries))
    val filtered =
      if (excludeSelf) joined.where(col("vec_id") =!= col("query_id"))
      else joined
    val wg = Window.partitionBy(col("query_id"), col(groupCol))
      .orderBy(col("dist"), col("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("vec_id"))
    filtered
      .select(col("query_id"), col("vec_id"), col(groupCol),
        dist(col("qvec"), col("vec")).as("dist"))
      .withColumn("grank", row_number().over(wg))
      .where(col("grank") <= perGroup)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col(groupCol),
        col("dist"))
  }

  /** Facet histogram of each query's exact top-k (Elastic-style search
    * facets): one row per (query, group) present in the top-k, with the
    * hit count and the group's best rank/distance. */
  def facetCounts(topkWithGroup: DataFrame, groupCol: String = "group"): DataFrame =
    topkWithGroup
      .groupBy(col("query_id"), col(groupCol))
      .agg(count(lit(1)).as("n_hits"),
        min(col("rank")).as("best_rank"),
        min(col("dist")).as("best_dist"))

  /** Keyset pagination (Elastic `search_after` / the reference's batch
    * protocol continued past k): page N+1 of a ranked result WITHOUT
    * re-materializing page N — candidates strictly after the cursor
    * (dist, vec_id) in lexicographic order, then the usual top-k. The
    * cursor rides a broadcast Q-row table; deep pagination costs the
    * same one corpus pass per page instead of rank > N·k over an
    * ever-larger window, and the strict keyset compare makes page
    * N+1-by-cursor provably identical to ranks N·k+1..(N+1)·k of the
    * full ranking (tie order is (dist, vec_id) everywhere). */
  def searchAfter(
      queries: DataFrame,
      candidates: DataFrame,
      cursors: DataFrame,
      k: Int,
      dist: (Column, Column) => Column = Distances.l2SqFast,
      excludeSelf: Boolean = false): DataFrame = {
    val withCursor = queries.join(cursors, Seq("query_id"))
    val joined = candidates.crossJoin(broadcast(withCursor))
    val filtered =
      if (excludeSelf) joined.where(col("vec_id") =!= col("query_id"))
      else joined
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("vec_id"))
    filtered
      .select(col("query_id"), col("vec_id"),
        dist(col("qvec"), col("vec")).as("dist"),
        col("after_dist"), col("after_vec_id"))
      .where(col("dist") > col("after_dist") ||
        (col("dist") === col("after_dist") && col("vec_id") > col("after_vec_id")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("dist"))
  }

  /** Page 2 of the exact self-search via [[searchAfter]] — the cursor is
    * page 1's last (raw-precision) hit; the oracle replays ranks
    * k+1..2k of the full ranking, pinning the keyset equivalence. */
  def selfSearchPage2(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int): DataFrame = {
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cands = embeddings.select(col("vec_id"), col("embedding").as("vec"))
    val cursors = KnnSearch.topK(q, cands, k = k, excludeSelf = true)
      .where(col("rank") === k)
      .select(col("query_id"), col("dist").as("after_dist"),
        col("vec_id").as("after_vec_id"))
    searchAfter(q, cands, cursors, k, excludeSelf = true)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** End-to-end grouped self-search over an embeddings table, grouping
    * by `label` — the oracle-able q_grouped_knn path. */
  def selfSearchGrouped(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int,
      perGroup: Int): DataFrame = {
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cands = embeddings.select(col("vec_id"), col("embedding").as("vec"),
      col("label").cast("long").as("group"))
    groupedTopK(q, cands, k, perGroup, excludeSelf = true)
      .select(col("query_id"), col("rank"), col("vec_id"), col("group"),
        round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** End-to-end facet report over the exact top-k — the oracle-able
    * q_facet_counts path. */
  def selfFacetCounts(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int): DataFrame = {
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cands = embeddings.select(col("vec_id"), col("embedding").as("vec"))
    val topk = KnnSearch.topK(q, cands, k = k, excludeSelf = true)
    // the Q×k edge table broadcasts; the corpus-sized label side streams
    val labeled = embeddings
      .select(col("vec_id"), col("label").cast("long").as("group"))
      .join(broadcast(topk), Seq("vec_id"))
    facetCounts(labeled)
      .select(col("query_id"), col("group"), col("n_hits"), col("best_rank"),
        round(col("best_dist"), 4).as("best_dist"))
      .orderBy(col("query_id"), col("group"))
  }
}
