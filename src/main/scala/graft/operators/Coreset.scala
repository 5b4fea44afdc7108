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
  * plane); the corpus carries a materialized RUNNING-MIN distance column,
  * so each of the k−1 steps is ONE `least(_md, distToNewCenter)` over one
  * scan plus a TakeOrdered(1) — O(d) expression growth per step, never
  * the O(k·d)-literal `least` tree whose codegen blows up well before
  * memory does (verdict r7 item 7: hundreds of fused folds in one
  * projection). Lineage is cut by a localCheckpoint every
  * `checkpointEvery` steps, so plan depth stays bounded at any k. The
  * corpus never shuffles; total work is O(k·n·d) (the incremental form —
  * the recompute form was O(k²·n·d), its crossover is k ≈ a few dozen
  * where the literal tree stops fusing).
  */
object Coreset {

  private def litVec(v: Array[Float]) = array(v.toSeq.map(lit(_)): _*)

  /** Select k centers. Output: (sel_rank, vec_id, dist) ordered by
    * sel_rank, where dist is the point's min L2² distance to the set
    * selected before it (coverage radius at that step; 0 for the seed).
    * Min is exactly associative (unlike double sums), so the incremental
    * running-min column is bit-identical to recomputing the full
    * min-over-selected each step — the DuckDB chained-CTE oracle replays
    * either form unchanged. */
  def kCenterGreedy(embeddings: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      checkpointEvery: Int = 32): DataFrame = {
    require(k >= 1, "kCenterGreedy: k must be >= 1")
    require(checkpointEvery >= 1, "kCenterGreedy: checkpointEvery must be >= 1")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val proj = embeddings.select(col(idCol), col(vecCol))
    // beyond n points every remaining min-distance is 0 and the argmax
    // would re-pick an already-selected id — fail loudly instead
    require(k <= proj.count(),
      s"kCenterGreedy: k=$k exceeds the corpus size")
    val seed = proj.orderBy(col(idCol)).as[(Long, Array[Float])].head()
    // (sel_rank, id, minDistToPriorSet) — k rows of driver state
    val selected = mutable.ArrayBuffer[(Long, Long, Double)]((0L, seed._1, 0.0))
    var state = proj.withColumn("_md",
      Distances.l2Sq(col(vecCol), litVec(seed._2)))
    var sinceCut = 0
    while (selected.length < k) {
      val next = state
        .select(col(idCol), col("_md"), col(vecCol))
        .orderBy(col("_md").desc, col(idCol))
        .limit(1)
        .as[(Long, Double, Array[Float])]
        .head()
      selected += ((selected.length.toLong, next._1, next._2))
      if (selected.length < k) {
        state = state.withColumn("_md",
          least(col("_md"), Distances.l2Sq(col(vecCol), litVec(next._3))))
        sinceCut += 1
        if (sinceCut >= checkpointEvery) {
          state = state.localCheckpoint(true)
          sinceCut = 0
        }
      }
    }
    selected.toSeq
      .toDF("sel_rank", idCol, "dist")
      .withColumn("dist", round(col("dist"), 4))
      .orderBy(col("sel_rank"))
  }
}
