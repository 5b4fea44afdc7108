package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Distributed top-k merge — the reference coordinator's `_merge_results`
  * (vector_search_cluster.py:300-359): per-shard partial top-k are
  * concatenated (U1), error shards dropped (P4), local ids globalized (J6),
  * and the global k smallest taken (A1/O1/O2).
  *
  * In Spark this is the native partial/final aggregation pattern: the
  * partial top-k is a window bounded per (query, shard); the final merge is
  * a second window per query over only Q×shards×k rows — tiny regardless of
  * data scale, so the merge never bottlenecks at 100 TB.
  */
object TopKMerge {

  /** Final merge over partial results
    * `(query_id, shard_id, vec_id, dist [, error])`: filters error rows
    * (P4, :316-319), takes the global top-k per query ordered by
    * (dist, vec_id) (A1, :341-345), and composes the reference's global id
    * `(shard_id, local_idx)` tuple (J6, :332-334). */
  def merge(partials: DataFrame, k: Int): DataFrame = {
    val clean =
      if (partials.columns.contains("error")) partials.where(col("error").isNull)
      else partials
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    clean
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .withColumn("global_id", struct(col("shard_id"), col("vec_id")))
  }

  /** End-to-end sharded search: hash-shard the vector table, compute the
    * per-(query, shard) partial top-k, then merge — semantically identical
    * to the single-pass KnnSearch.topK (the A1 invariant: merge of local
    * top-k == global top-k; SURVEY §5.3). */
  def shardedSelfTopK(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int,
      numShards: Int,
      dist: (Column, Column) => Column = Distances.l2SqFast): DataFrame = {
    val sharded = Sharding.withHashShard(embeddings, "embedding", numShards)
    val q = embeddings
      .where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val partialW = Window
      .partitionBy(col("query_id"), col("shard_id"))
      .orderBy(col("dist"), col("vec_id"))
    val partials = sharded
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"), col("shard_id"), col("vec_id"),
        dist(col("qvec"), col("embedding")).as("dist"))
      .withColumn("prank", row_number().over(partialW))
      .where(col("prank") <= k)
      .drop("prank")
    merge(partials, k)
  }
}
