package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Training-pair mining over a labeled embedding table — the retrieval
  * side of contrastive-learning data preparation (the labels in
  * `embeddings.parquet` play the role of positive-class ids).
  *
  * Both operators are the FLAT k-NN plan (broadcast query set →
  * map-side fused distance → `WindowGroupLimit` per-query heap,
  * reference search path vector_search_cluster.py:593, merge :300-359)
  * with one extra predicate or aggregate, so the 100 TB story is the
  * FLAT one: the corpus streams partition-parallel, only Q×k×partitions
  * rows shuffle, and the label predicate is evaluated map-side BEFORE
  * the heap — filtering shrinks the window input, never re-ranks it.
  */
object Mining {

  /** Hard-negative mining: for each of the first `numQueries` vectors,
    * the `k` nearest vectors whose label DIFFERS from the query's own —
    * the standard "hardest negatives" selection for contrastive /
    * metric-learning training (nearest in embedding space, wrong class).
    * Output: (query_id, rank, vec_id, neg_label, dist), ties by vec_id.
    * Self-match is excluded for free (the query row shares its own
    * label). */
  def hardNegatives(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int,
      dist: (Column, Column) => Column = Distances.l2SqFast): DataFrame = {
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    embeddings.crossJoin(broadcast(q))
      .where(col("label") =!= col("qlabel"))
      .select(col("query_id"), col("vec_id"),
        col("label").cast("long").as("neg_label"),
        dist(col("qvec"), col("embedding")).as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("neg_label"),
        round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** k-NN classification: predict each query's label as the majority
    * label among its `k` nearest neighbors (self excluded); vote ties
    * break to the SMALLER label (deterministic total order). Output:
    * (query_id, true_label, pred_label, n_votes, correct) — the
    * standard embedding-quality eval (a cheap probe of how well the
    * space separates classes).
    *
    * Plan: FLAT top-k (bounded heap) → per-(query, label) count — a
    * Q×k-row aggregate, control-plane sized — → per-query argmax via a
    * second tiny window. Only the first stage touches the corpus. */
  def knnClassify(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int,
      dist: (Column, Column) => Column = Distances.l2SqFast): DataFrame = {
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("label").as("qlabel"))
    val wTop = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    val knn = embeddings.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qlabel"), col("vec_id"), col("label"),
        dist(col("qvec"), col("embedding")).as("dist"))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
    val wVote = Window.partitionBy(col("query_id"))
      .orderBy(col("n_votes").desc, col("label"))
    knn.groupBy(col("query_id"), col("qlabel"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("r", row_number().over(wVote))
      .where(col("r") === 1)
      .select(col("query_id"),
        col("qlabel").cast("long").as("true_label"),
        col("label").cast("long").as("pred_label"),
        col("n_votes"),
        (col("label") === col("qlabel")).as("correct"))
      .orderBy(col("query_id"))
  }

  /** Reciprocal (mutual) k-NN pairs from ANY (query_id, vec_id, dist)
    * top-k edge table: the unordered pairs {a, b} where b is in a's
    * top-k AND a is in b's — the standard high-precision near-duplicate
    * / matching criterion (reciprocal-NN matching; also the edge rule
    * for mutual-kNN graphs in clustering). One row per surviving pair,
    * canonicalized a < b, carrying the (symmetric-metric) distance.
    *
    * Deliberately list-agnostic: feed it FLAT top-k for the exact form
    * (oracle-able), or any ANN family's output at 100 TB — the operator
    * itself is a self-equi-join of a Q×k-row edge set on the reversed
    * key, control-plane sized next to whatever produced the lists. */
  def mutualPairs(topk: DataFrame): DataFrame = {
    val fwd = topk.select(col("query_id").as("a"), col("vec_id").as("b"),
      col("dist"))
    val rev = topk.select(col("vec_id").as("a"), col("query_id").as("b"))
    fwd.join(rev, Seq("a", "b"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), round(col("dist"), 4).as("dist"))
      .orderBy(col("a"), col("b"))
  }

  /** Exact mutual-kNN self-search over the first `n` vectors: FLAT
    * top-k restricted to the slice (queries AND candidates — both
    * directions of every edge exist in the table, so reciprocity is
    * decidable), then [[mutualPairs]]. */
  def mutualKnn(
      embeddings: DataFrame,
      n: Int,
      k: Int,
      dist: (Column, Column) => Column = Distances.l2SqFast): DataFrame = {
    val slice = embeddings.where(col("vec_id") < n)
    val q = slice.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val v = slice.select(col("vec_id"), col("embedding").as("vec"))
    mutualPairs(KnnSearch.topK(q, v, k = k, dist = dist, excludeSelf = true))
  }
}
