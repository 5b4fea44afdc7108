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

  /** The planning aggregate: survivor fraction of the predicate over
    * the corpus (1.0 for an empty corpus — the brute branch trivially
    * wins there). One map-side count pass; at scale a sampled or
    * sketched estimate drops into the same slot. */
  def selectivityOf(embeddings: DataFrame, predicate: Column): Double = {
    val row = embeddings
      .agg(count(lit(1)).as("n"),
        sum(when(predicate, 1L).otherwise(0L)).as("m"))
      .head()
    val n = row.getLong(0)
    if (n == 0) 0.0 else row.getLong(1).toDouble / n
  }

  /** Which branch [[search]] takes for the given predicate. */
  def chooseBruteForce(embeddings: DataFrame, predicate: Column,
      maxSelectivity: Double): Boolean =
    selectivityOf(embeddings, predicate) <= maxSelectivity

  /** The measured filtered-beam rule (SCALE.md round-11 ladder, made
    * code in r12 — verdict item 4): under a selectivity-s predicate
    * only ~s of a graph walk's visited nodes are emittable, so a
    * production beam b yields ~b·s usable candidates; scaling the walk
    * to ceil(b/s) restores the unfiltered beam's candidate budget
    * (measured on the 100× fixture: Vamana L=64 at s≈0.1 scored
    * 737-775 pm; L=640≈64/0.1 recovered 925-963 pm for ~15 % more
    * serve time). Never shrinks the caller's beam; saturates safely at
    * Int.MaxValue (the exactness pins' beam is a fixed point). */
  def autoBeam(beam: Int, selectivity: Option[Double]): Int =
    selectivity.filter(s => s > 0.0 && s < 1.0).fold(beam) { s =>
      math.min(Int.MaxValue.toDouble,
        math.max(beam.toDouble, math.ceil(beam / s))).toInt
    }

  /** [[autoBeam]] with the SECOND measured floor: near-duplicate
    * multiplicity. The round-12 fine ladder on the 100× replica fixture
    * (SCALE.md) shows filtered recall tracks ABSOLUTE beam almost
    * independently of selectivity when the corpus carries m-way
    * near-duplicate clouds sharing one label (64→738/775 pm,
    * 640→925/963 pm at 40 %/10 % alike): the beam fills with one
    * cloud's ties, so it must hold ~k·m entries to bridge to the next
    * distinct neighbor. `dupMultiplicity` is the mean near-dup cluster
    * size of the indexed corpus — a number the engine's own dedup
    * family reports offline (Dedup.dupClusters sizes / SemanticDedup) —
    * and the rule doubles as the quantified case for DEDUPING before
    * indexing: serve cost scales with the duplication you did not
    * remove. */
  def autoBeam(beam: Int, selectivity: Option[Double], k: Int,
      dupMultiplicity: Option[Double]): Int = {
    val selScaled = autoBeam(beam, selectivity)
    dupMultiplicity.filter(_ > 1.0).fold(selScaled) { m =>
      math.min(Int.MaxValue.toDouble,
        math.max(selScaled.toDouble, math.ceil(k * m))).toInt
    }
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
    val sel = selectivityOf(embeddings, predicate)
    if (sel <= maxSelectivity) {
      val q = embeddings.where(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val cands = embeddings.where(predicate)
        .select(col("vec_id"), col("embedding").as("vec"))
      KnnSearch.topK(q, cands, k = k, excludeSelf = true)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("dist"), 4).as("dist"))
        .orderBy(col("query_id"), col("rank"))
    } else {
      // the planner already paid for the selectivity aggregate — reuse
      // it to scale the graph branch's beam by the measured rule
      // instead of leaving the mitigation as a manual knob
      VamanaIndex.selfSearchFiltered(embeddings, predicate, numQueries, k,
        numPartitions = numPartitions,
        searchBeam = autoBeam(searchBeam, Some(sel)))
    }
  }
}
