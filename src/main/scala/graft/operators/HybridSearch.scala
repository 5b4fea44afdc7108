package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid-search fusion: reciprocal-rank fusion (RRF, Cormack et al.) of
  * two ranked result lists — the standard way to combine lexical (BM25)
  * and vector (cosine k-NN) retrieval without score calibration:
  *
  *   rrf(d) = Σ_lists 1/(kConst + rank_list(d)),  missing ⇒ contributes 0.
  *
  * Scale design: inputs are top-N result lists — bounded by construction
  * — so the fusion join and final sort touch N+M rows total no matter
  * the corpus size; the expensive work already happened inside each
  * retriever's own scale-safe plan.
  */
object HybridSearch {

  /** Rank a bounded result list (≤ top-N rows by construction) without
    * a window: rank(x) = 1 + |{y : y sorts strictly before x}|, via a
    * broadcast theta-join of the list against itself. Equal to
    * `row_number().over(Window.orderBy(score desc, id))` when
    * (scoreCol, idCol) is unique — which a top-N list always is — but
    * plans as a broadcast join + partial agg instead of the
    * single-partition global WindowExec. The input is evaluated twice;
    * callers pass an already-materialized (checkpointed) list.
    *
    * Output: (idCol, rank) with rank 1-based long. */
  def rankBounded(list: DataFrame, idCol: String, scoreCol: String): DataFrame = {
    val better = list.select(col(idCol).as("_y_id"), col(scoreCol).as("_y_s"))
    list.join(broadcast(better),
        col("_y_s") > col(scoreCol) ||
          (col("_y_s") === col(scoreCol) && col("_y_id") < col(idCol)),
        "left")
      .groupBy(col(idCol))
      .agg((count(col("_y_id")) + 1L).cast("long").as("rank"))
  }

  /** Fuse two (doc_id, rank) lists; returns (doc_id, rrf) top `topN` by
    * (rrf desc, doc_id). The two reciprocal terms are summed in fixed
    * written order, so the double arithmetic is reproducible. */
  def rrfFuse(a: DataFrame, b: DataFrame, kConst: Int, topN: Int): DataFrame = {
    val aa = a.toDF("doc_id", "rank_a")
    val bb = b.toDF("doc_id", "rank_b")
    aa.join(bb, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(kConst.toDouble) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kConst.toDouble) + col("rank_b")), lit(0.0)))
      .select(col("doc_id"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topN)
  }
}
