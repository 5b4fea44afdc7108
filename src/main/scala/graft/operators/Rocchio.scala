package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Rocchio pseudo-relevance feedback (Rocchio 1971, the SMART system's
  * query-refinement rule; "PRF" in modern IR): run the query, assume the
  * top-f results are relevant, move the query toward their centroid,
  * and search again:
  *
  *   q′ = α·q + β·(Σ_{d ∈ top-f} d)/f
  *
  * The vector-search analog of the text form — a second-round k-NN with
  * a feedback-shifted query, the standard recall-booster when a single
  * embedding under-specifies intent.
  *
  * Determinism for the oracle: the feedback fold runs in RANK order
  * (first-round rank, the engine's deterministic tie rule), so the
  * per-dimension double sums are bit-reproducible; everything else is
  * the exact FLAT protocol on both rounds.
  *
  * Scale: round 1 is the FLAT plan (broadcast queries, per-query
  * window); the feedback join touches Q×f rows against the corpus by
  * vec_id (broadcast the Q×f side); the q′ table is Q rows (broadcast);
  * round 2 is again the FLAT plan. The corpus is scanned twice and
  * never shuffles. */
object Rocchio {

  /** Two-round PRF self-search. Output: (query_id, rank, vec_id, dist)
    * — round-2 ranking under q′, self excluded, ties by vec_id. */
  def selfSearch(embeddings: DataFrame, numQueries: Int, feedback: Int, k: Int,
      alpha: Double = 0.5, beta: Double = 0.5): DataFrame = {
    val dim = embeddings.select(size(col("embedding"))).head().getInt(0)
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val round1 = KnnSearch.topK(q, embeddings.select(col("vec_id"), col("embedding").as("vec")),
      k = feedback, excludeSelf = true)
    // feedback centroid: per-dim sums folded in round-1 RANK order
    val zeros = array_repeat(lit(0.0d), dim)
    val fb = round1
      .join(embeddings.select(col("vec_id"), col("embedding").as("fvec")), Seq("vec_id"))
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("rank"), col("fvec")))).as("lst"))
      .select(col("query_id"),
        aggregate(col("lst"), zeros,
          (acc, s) => zip_with(acc, Distances.toDouble(s.getField("fvec")),
            (a, x) => a + x)).as("fsum"))
    val newQ = q.join(fb, Seq("query_id"))
      .select(col("query_id"),
        zip_with(Distances.toDouble(col("qvec")), col("fsum"),
          (qi, si) => lit(alpha) * qi + lit(beta) * (si / feedback.toDouble))
          .as("qvec"))
    // q' is array<double>, so round 2 uses the HOF distance (the fused
    // L2SqDistance is float-typed; the two are bit-identical by spec)
    KnnSearch.topK(newQ, embeddings.select(col("vec_id"), col("embedding").as("vec")),
        k = k, dist = Distances.l2Sq, excludeSelf = true)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }
}
