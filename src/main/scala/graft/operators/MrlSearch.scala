package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Matryoshka-style coarse-to-fine search (Kusupati et al. 2022,
  * arXiv:2205.13147 — MRL embeddings carry usable prefixes): rank a
  * cheap shortlist on the first `coarseDims` dimensions, then re-rank
  * ONLY the shortlist at full precision. The dataflow twin of PQ's
  * ADC-shortlist + exact re-rank, with prefix truncation as the coarse
  * quantizer — both stages exact given their inputs, so the composed
  * result is deterministic and oracle-checkable (unlike trained ANN).
  *
  * Scale: the coarse pass scans `coarseDims/d` of the vector bytes
  * (column-pruned at the parquet scan when the prefix is stored as its
  * own column); the fine pass touches shortlist×Q rows via a broadcast
  * semi-join against the full-precision table. Shortlist size trades
  * recall@k against re-rank cost exactly like PQ's `shortlist`.
  */
object MrlSearch {

  /** Self-search: coarse top-`shortlist` on `slice(embedding, 1,
    * coarseDims)` distance, exact re-rank to top-`k`. Output matches the
    * other k-NN operators: (query_id, rank, vec_id, dist). */
  def selfSearch(embeddings: DataFrame, numQueries: Int, coarseDims: Int,
      shortlist: Int, k: Int): DataFrame = {
    val coarse = embeddings.select(col("vec_id"),
      slice(col("embedding"), 1, coarseDims).as("cvec"))
    val q = coarse.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("cvec").as("qcvec"))
    val wc = Window.partitionBy(col("query_id")).orderBy(col("cdist"), col("vec_id"))
    val short = coarse.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Distances.l2SqFast(col("qcvec"), col("cvec")).as("cdist"))
      .withColumn("crank", row_number().over(wc).cast("long"))
      .where(col("crank") <= shortlist)
      .select(col("query_id"), col("vec_id"))

    val full = embeddings.select(col("vec_id"), col("embedding"))
    val qf = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val wf = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    short.join(full, Seq("vec_id"))
      .join(broadcast(qf), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        Distances.l2SqFast(col("qvec"), col("embedding")).as("dist"))
      .withColumn("rank", row_number().over(wf).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }
}
