package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding pooling — mean vectors per group. The workhorse of
  * training-data curation pipelines: class centroids for SemDeDup-style
  * cluster pruning, chunk→document embedding mean-pooling, and
  * per-source embedding drift monitoring all reduce to "average the
  * vectors within a key".
  *
  * Scale design: `posexplode` is map-side (n·d rows but no wider than the
  * input bytes); the (key, dim) aggregate partial-aggregates before the
  * shuffle, so only |keys|·d pre-combined rows cross the wire — never the
  * raw vectors. Output is long-form (key, dim, mean): friendlier to the
  * oracle than nested arrays and directly joinable as a centroid table.
  */
object EmbeddingPool {

  /** Per-key per-dimension mean over a vector column. Output:
    * (keyCol, dim, n, mean) with dim 0-based and mean rounded to 4. */
  def meanPool(df: DataFrame, keyCol: String,
      vecCol: String = "embedding"): DataFrame =
    df.select(col(keyCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col(keyCol), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("x").cast("double")), 4).as("mean"))
}
