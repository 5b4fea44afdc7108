package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Greedy k-center / farthest-point traversal (Gonzalez 1985) — the
  * coreset selection rule of Sener & Savarese 2018 ("Active Learning for
  * Convolutional Neural Networks: A Core-Set Approach"), the standard
  * diversity-driven training-data selection: repeatedly add the point
  * farthest (exact L2²) from the already-selected set. The selected set
  * 2-approximates the optimal k-center cover, and the k-th selection
  * distance IS the corpus coverage radius — the diversity complement of
  * the density-driven selectors ([[Dsir]] importance resampling,
  * [[EmbeddingQuality.prototypePrune]]).
  *
  * Deterministic end-to-end (⇒ DuckDB-replayable): seed = smallest id;
  * each step maximizes min-distance-to-selected with ties broken by
  * smallest id. Exact min/max comparisons are safe across engines —
  * unlike double sums, `least`/ordering have no fold-order sensitivity —
  * and the distances themselves are the bit-parity [[Distances.l2Sq]]
  * fold.
  *
  * Scale: the selected set is the ONLY driver state (k vectors — control
  * plane); each of the k−1 steps is one map-side min-fold over the
  * broadcast-literal selected set plus a TakeOrdered(1) — the corpus
  * never shuffles and is read k−1 times (at 100 TB, cache/checkpoint the
  * projection, or maintain a materialized running-min column; the
  * recompute form keeps zero mutable distributed state). Work is
  * O(k²·n·d) total, the textbook cost of exact farthest-point traversal.
  */
object Coreset {

  /** Select k centers. Output: (sel_rank, vec_id, dist) ordered by
    * sel_rank, where dist is the point's min L2² distance to the set
    * selected before it (coverage radius at that step; 0 for the seed). */
  def kCenterGreedy(embeddings: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, "kCenterGreedy: k must be >= 1")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val proj = embeddings.select(col(idCol), col(vecCol))
    // beyond n points every remaining min-distance is 0 and the argmax
    // would re-pick an already-selected id — fail loudly instead
    require(k <= proj.count(),
      s"kCenterGreedy: k=$k exceeds the corpus size")
    val seed = proj.orderBy(col(idCol)).as[(Long, Array[Float])].head()
    // (sel_rank, id, minDistToPriorSet, vec) — k rows of driver state
    val selected = mutable.ArrayBuffer[(Long, Long, Double, Array[Float])](
      (0L, seed._1, 0.0, seed._2))
    while (selected.length < k) {
      val dists = selected.map { case (_, _, _, v) =>
        Distances.l2Sq(col(vecCol), array(v.toSeq.map(lit(_)): _*))
      }.toSeq
      val minDist = if (dists.length == 1) dists.head else least(dists: _*)
      val next = proj
        .select(col(idCol), minDist.as("_md"), col(vecCol))
        .orderBy(col("_md").desc, col(idCol))
        .limit(1)
        .as[(Long, Double, Array[Float])]
        .head()
      selected += ((selected.length.toLong, next._1, next._2, next._3))
    }
    selected.toSeq.map { case (r, id, d, _) => (r, id, d) }
      .toDF("sel_rank", idCol, "dist")
      .withColumn("dist", round(col("dist"), 4))
      .orderBy(col("sel_rank"))
  }
}
