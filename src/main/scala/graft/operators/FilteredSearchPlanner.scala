package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Selectivity-based filtered-search planning — the cardinality rule
  * production filtered-ANN engines apply per query (Qdrant's cardinality
  * estimator picks payload-filtered brute scan vs graph walk; ACORN
  * [Patel et al. 2024] formalizes the same crossover): a highly
  * selective predicate makes the exact brute-force scan over the
  * surviving rows CHEAPER than an index walk (few candidates — and
  * exact); a permissive predicate keeps the graph path (the filtered
  * walk's cost barely grows while the survivor set approaches the full
  * corpus).
  *
  * The planning input is ONE map-side count aggregate (survivors /
  * total — at scale, a sampled or sketched estimate drops into the same
  * decision), and the decision is driver-side. Both branches are
  * existing oracle-verified operators:
  *   - selective  → [[KnnSearch.topK]] over the predicate-pushed scan
  *     (EXACT — the q_filtered_knn plan, predicate reaches parquet);
  *   - permissive → [[VamanaIndex.selfSearchFiltered]] (graph walk,
  *     exact at beam ≥ shard size, recall-traded below).
  */
object FilteredSearchPlanner {

  /** Which branch [[search]] takes for the given predicate. */
  def chooseBruteForce(embeddings: DataFrame, predicate: Column,
      maxSelectivity: Double): Boolean = {
    val row = embeddings
      .agg(count(lit(1)).as("n"),
        sum(when(predicate, 1L).otherwise(0L)).as("m"))
      .head()
    val n = row.getLong(0)
    n == 0 || row.getLong(1).toDouble / n <= maxSelectivity
  }

  /** Filtered self-search with the cardinality rule. `maxSelectivity`
    * is the crossover (survivor fraction at or below which the brute
    * branch wins). Both branches emit the standard (query_id, rank,
    * vec_id, dist) protocol. */
  def search(
      embeddings: DataFrame,
      predicate: Column,
      numQueries: Int,
      k: Int,
      maxSelectivity: Double = 0.5,
      numPartitions: Int = 4,
      searchBeam: Int = 512): DataFrame = {
    if (chooseBruteForce(embeddings, predicate, maxSelectivity)) {
      val q = embeddings.where(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val cands = embeddings.where(predicate)
        .select(col("vec_id"), col("embedding").as("vec"))
      KnnSearch.topK(q, cands, k = k, excludeSelf = true)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("dist"), 4).as("dist"))
        .orderBy(col("query_id"), col("rank"))
    } else {
      VamanaIndex.selfSearchFiltered(embeddings, predicate, numQueries, k,
        numPartitions = numPartitions, searchBeam = searchBeam)
    }
  }
}
