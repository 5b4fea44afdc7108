package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Embedding-space data curation: flag vectors that sit abnormally far
  * from their own class centroid — the standard mislabeled-sample /
  * corrupted-embedding pruning step of a training-data pipeline (the
  * vector analog of the text quality gate).
  *
  * Determinism note: centroids use the ROUNDED per-dim means
  * ([[EmbeddingPool.meanPool]]'s round(avg, 4)) so the centroid — and
  * therefore every distance — is bit-identical across engines and
  * partitionings; a raw double mean would differ in the last ulps by
  * fold order and break oracle hashing.
  *
  * Scale: the centroid table is labels×d rows (control-plane) →
  * broadcast; the distance is a map-side projection; the per-label
  * mean/stddev of distances is one map-combinable aggregate over
  * labels-many groups, broadcast back. The corpus streams through
  * twice, never shuffles.
  */
object EmbeddingQuality {

  /** Per-label centroid as one array<double> row per label (rounded
    * per-dim means, ascending dim). */
  def labelCentroidArrays(embeddings: DataFrame): DataFrame =
    EmbeddingPool.meanPool(embeddings, "label")
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("mean")))),
        s => s.getField("mean")).as("centroid"))

  /** Distance of every vector to its own label centroid, flagged
    * against a per-label z-score threshold: outlier ⟺
    * dist > mean_dist + z·stddev_samp(dist). Output:
    * (vec_id, label, dist, is_outlier), ordered by vec_id. */
  def outliers(embeddings: DataFrame, z: Double): DataFrame = {
    val cents = labelCentroidArrays(embeddings)
    val scored = embeddings
      .join(broadcast(cents), Seq("label"))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        Distances.l2Sq(col("embedding"), col("centroid")).as("dist"))
    val stats = scored.groupBy(col("label"))
      .agg(avg(col("dist")).as("mean_dist"),
        stddev_samp(col("dist")).as("sd_dist"))
    scored.join(broadcast(stats), Seq("label"))
      .select(col("vec_id"), col("label"),
        round(col("dist"), 4).as("dist"),
        (col("dist") > col("mean_dist") + lit(z) * col("sd_dist")).as("is_outlier"))
      .orderBy(col("vec_id"))
  }

  /** Self-supervised-prototypes data pruning (Sorscher et al. 2022,
    * "Beyond neural scaling laws" — the SSL-prototypes metric): score
    * every example by L2² to its assigned cluster prototype, then keep
    * the ⌈keepFrac·n_c⌉ HARDEST (farthest — `keepHard`) examples of
    * each cluster — the paper's rule when data is abundant; flip
    * `keepHard=false` for the scarce-data regime (keep easy/
    * prototypical). Prototypes here are the engine's seeded-centroid
    * rule (deterministic ⇒ DuckDB-replayable end to end); swap in
    * `IvfIndex.trainCentroids` for the paper's k-means (recall-gated
    * path).
    *
    * Scale: assignment is the shuffle-free fused argmin
    * ([[IvfIndex.assign]]); the scoring join is a broadcast of the
    * model-sized prototype table; the keep-rule is one window per
    * cluster (parallel across clusters, AQE/salting handles Zipf cells
    * like every other cluster_id stage). Output:
    * (vec_id, cluster_id, proto_dist, keep_rank) ordered by vec_id. */
  def prototypePrune(
      embeddings: DataFrame,
      centroids: Array[IvfIndex.Centroid],
      keepFrac: Double,
      keepHard: Boolean = true): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents = centroids.toSeq.toDF("cluster_id", "centroid")
    val ordering =
      if (keepHard) org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id")).orderBy(col("proto_dist").desc, col("vec_id"))
      else org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id")).orderBy(col("proto_dist"), col("vec_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))
    IvfIndex.assign(embeddings, centroids)
      .join(broadcast(cents), Seq("cluster_id"))
      .select(col("vec_id"), col("cluster_id"),
        Distances.l2Sq(col("embedding"), col("centroid")).as("proto_dist"))
      .withColumn("keep_rank", row_number().over(ordering).cast("long"))
      .withColumn("n_c", count(lit(1)).over(wAll))
      .where(col("keep_rank") <= ceil(lit(keepFrac) * col("n_c")))
      .select(col("vec_id"), col("cluster_id"),
        round(col("proto_dist"), 4).as("proto_dist"), col("keep_rank"))
      .orderBy(col("vec_id"))
  }

  /** Per-label centroid drift between two corpus halves (vec_id parity
    * split — any deterministic split works): L2 distance between the
    * halves' rounded per-dim centroids. The embedding-space analog of
    * the reference's operational monitoring (distribution drift between
    * ingest batches). Exact across engines for the same reason as
    * [[outliers]] — rounded means. */
  def labelDrift(embeddings: DataFrame): DataFrame = {
    def half(parity: Int) =
      EmbeddingPool.meanPool(
        embeddings.where(pmod(col("vec_id"), lit(2)) === parity), "label")
        .select(col("label"), col("dim"), col("mean"), col("n"))
    half(0).as("a").join(half(1).as("b"), Seq("label", "dim"))
      .groupBy(col("label"))
      .agg(
        round(sqrt(sum(pow(col("a.mean") - col("b.mean"), 2))), 4).as("drift"),
        (max(col("a.n")) + max(col("b.n"))).as("n_vecs"))
      .select(col("label").cast("long").as("label"), col("drift"), col("n_vecs"))
      .orderBy(col("label"))
  }

  /** Embedding-space (semantic) decontamination — the fuzzy complement
    * of [[CorpusOps.decontaminate]]'s exact n-gram rule (the gap the
    * n-gram matcher misses: paraphrased/translated eval leakage): drop
    * every corpus row whose max cosine similarity to ANY eval-set
    * vector is ≥ tau. Output: surviving (vec_id, max_sim) — max_sim is
    * the contamination margin the curator tunes tau against.
    *
    * Scale: eval sets are model-plane-sized (thousands of rows), so the
    * eval side broadcasts and the corpus streams map-side through ONE
    * BroadcastNestedLoopJoin; partial aggregation collapses the fan-out
    * before the shuffle, which then carries one slim (id, max) row per
    * corpus row — never the vectors, never an all-pairs materialization.
    * max is fold-order-insensitive (unlike sums), so the
    * groupBy needs no sorted-fold discipline and the DuckDB replay is
    * exact. For eval sets too big to broadcast, pre-reduce them with
    * [[Dedup.semanticDedup]]-style clustering first — the tau test only
    * needs a tau/2-cover of the eval set to stay sound within tau/2. */
  def decontaminateSemantic(corpus: DataFrame, evalSet: DataFrame,
      tau: Double, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ev = broadcast(
      evalSet.select(col(idCol).as("_eval_id"), col(vecCol).as("_eval_vec")))
    corpus.select(col(idCol), col(vecCol)).crossJoin(ev)
      .groupBy(col(idCol))
      .agg(max(Distances.cosineSim(col(vecCol), col("_eval_vec"))).as("max_sim"))
      .where(col("max_sim") < tau)
      .select(col(idCol), round(col("max_sim"), 6).as("max_sim"))
      .orderBy(col(idCol))
  }
}
