package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Ranked-retrieval quality metrics — the evaluation surface of the
  * search engine: per-query precision@k, MRR@k, and NDCG@k with label
  * agreement as graded-binary relevance (neighbor shares the query's
  * label ⟹ relevant), the standard proxy eval on a labeled embedding
  * corpus.
  *
  * Plan: the FLAT top-k (broadcast queries, WindowGroupLimit heap)
  * produces Q×k rows; every metric is then one grouped aggregate over
  * that control-plane-sized set — corpus-scale work happens only in the
  * retrieval stage, and swapping in any ANN path (IVF/PQ/HNSW/binary)
  * evaluates that index instead. NDCG log terms use log2 on both
  * engines; outputs round to 4 decimals like every other oracle
  * surface.
  */
object RetrievalEval {

  /** Per-query metrics over self-search with label relevance. Output:
    * (query_id, n_rel, precision, mrr, ndcg), ordered by query_id.
    * Queries with zero relevant neighbors in the top-k score 0 for all
    * three metrics (the conventional treatment). */
  def labelMetrics(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int): DataFrame = {
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    val knn = embeddings.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (col("label") === col("qlabel")).cast("int").as("rel"),
        Distances.l2SqFast(col("qvec"), col("embedding")).as("dist"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
    // dcg = sum(rel / log2(rank+1)); idcg = ideal ordering of the same
    // relevance multiset = first n_rel ranks all relevant
    val idcgAtN = (n: org.apache.spark.sql.Column) =>
      aggregate(sequence(lit(1), n), lit(0.0),
        (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1.0))
    knn.groupBy(col("query_id"))
      .agg(
        sum(col("rel")).cast("long").as("n_rel"),
        (sum(col("rel")).cast("double") / k).as("p_raw"),
        max(when(col("rel") === 1, lit(1.0) / col("rank").cast("double"))
          .otherwise(lit(0.0))).as("mrr_raw"),
        sum(col("rel").cast("double") / log2(col("rank").cast("double") + 1.0))
          .as("dcg"))
      .select(col("query_id"), col("n_rel"),
        round(col("p_raw"), 4).as("precision"),
        round(col("mrr_raw"), 4).as("mrr"),
        round(when(col("n_rel") === 0, lit(0.0))
          .otherwise(col("dcg") / idcgAtN(col("n_rel").cast("int"))), 4).as("ndcg"))
      .orderBy(col("query_id"))
  }
}
