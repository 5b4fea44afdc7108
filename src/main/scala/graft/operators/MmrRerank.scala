package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Maximal-marginal-relevance (MMR) result diversification — the standard
  * second-stage reranker of a retrieval pipeline (Carbonell & Goldstein
  * 1998): from a bounded candidate list per query, greedily pick results
  * that are relevant to the query but dissimilar to what is already
  * picked. The reference serves raw FAISS top-k (vector_search_cluster
  * .py:593); diversification is the first thing a production retrieval
  * stack layers on top, and it composes with every index family here
  * (FLAT/IVF/PQ/HNSW produce the candidates, MMR reranks them).
  *
  * Scale design: stage 1 is the existing broadcast k-NN (corpus-parallel,
  * top-n per query); stage 2 operates on Q×n rows — control-plane sized
  * by construction — grouped into one array per query and reranked by the
  * fused [[graft.plans.MmrSelect]] in a single pass. The corpus is never
  * touched after stage 1, so the whole reranker adds one tiny shuffle
  * (Q×n rows hash-partitioned by query_id) regardless of corpus size.
  */
object MmrRerank {

  /** Column wrapper for [[graft.plans.MmrSelect]]. */
  def mmrSelect(cands: Column, lam: Double, m: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.MmrSelect(
      ColumnBridge.expression(cands), lam, m))
  }

  /** Greedy MMR over per-query candidates `(query_id, vec_id, rel,
    * vec: array<float>)`: select `m` with tradeoff `lam` (1.0 = pure
    * relevance, 0.0 = pure diversity). Output: (query_id, rank, vec_id,
    * score) where score is the marginal-relevance value at pick time,
    * rounded to 4 decimals. */
  def rerank(candidates: DataFrame, lam: Double, m: Int): DataFrame =
    candidates.groupBy(col("query_id"))
      .agg(sort_array(collect_list(
        struct(col("vec_id"), col("rel"), col("vec")))).as("cands"))
      .select(col("query_id"),
        posexplode(mmrSelect(col("cands"), lam, m)).as(Seq("pos", "pick")))
      .select(col("query_id"), col("pick.rank").as("rank"),
        col("pick.vec_id").as("vec_id"),
        round(col("pick.score"), 4).as("score"))
      .orderBy(col("query_id"), col("rank"))

  /** End-to-end self-query pipeline: cosine top-`n` candidates (rel =
    * cosine similarity, self excluded) → MMR pick of `m`. Same query
    * protocol as the other self-search paths (queries = vec_id <
    * numQueries). */
  def selfRerank(
      embeddings: DataFrame,
      numQueries: Int,
      n: Int,
      m: Int,
      lam: Double): DataFrame = {
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("vec_id"))
    val cands = embeddings.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("embedding").as("vec"),
        Distances.cosineSimFast(col("qvec"), col("embedding")).as("rel"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= n)
      .drop("rk")
    rerank(cands, lam, m)
  }
}
