package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PCA dimensionality reduction for the embedding pipeline — the
  * standard pre-indexing compression (FAISS `PCAMatrix` / OPQ's first
  * stage): project d-dim embeddings onto the top-k principal components
  * before ANN indexing, trading recall for a k/d memory + distance-cost
  * cut that composes with IVF/PQ/SQ.
  *
  * Scale design: the model is trained on a bounded sample (the same
  * first-batch rule as KMeans/PQ training — cost O(sample), not
  * O(corpus)); the learned d×k component matrix ships with the task
  * binary and projection is a map-side BLAS gemv per row — no shuffle
  * anywhere. Deterministic for a fixed sample (eigendecomposition, no
  * randomness), but not SQL-reproducible → spec-gated, not
  * oracle-matched (same verification class as trained IVF/HNSW).
  */
object PcaReduce {

  /** Fit on a bounded sample, project every row; adds `reduced`
    * (array<double>, length k). */
  def reduce(embeddings: DataFrame, k: Int, trainSample: Int = 10000): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val feats = embeddings.withColumn("features", array_to_vector(col("embedding")))
    val model = new PCA()
      .setInputCol("features").setOutputCol("reduced_vec").setK(k)
      // deterministic sample: first-N by id (TakeOrderedAndProject)
      .fit(feats.orderBy(col("vec_id")).limit(trainSample))
    model.transform(feats)
      .withColumn("reduced", vector_to_array(col("reduced_vec")))
      .drop("features", "reduced_vec")
  }

  /** Fraction of variance captured by the top-k components (model
    * quality scalar for pipeline gating). */
  def explainedVariance(embeddings: DataFrame, k: Int,
      trainSample: Int = 10000): Double = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.array_to_vector
    val feats = embeddings.withColumn("features", array_to_vector(col("embedding")))
    new PCA().setInputCol("features").setOutputCol("r").setK(k)
      .fit(feats.orderBy(col("vec_id")).limit(trainSample))
      .explainedVariance.toArray.sum
  }
}
