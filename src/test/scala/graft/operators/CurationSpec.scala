package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("keepBestByQuality: one row per cluster, kept member maximizes (quality, -doc_id)") {
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // cluster 1: three members
      (4L, 4L), // singleton
      (5L, 5L), (6L, 5L)).toDF("doc_id", "canonical_id")
    val scored = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.9), // tie at 0.9 → doc 2 wins
      (4L, 0.1),
      (5L, 0.3), (6L, 0.2)).toDF("doc_id", "quality")
    val r = Dedup.keepBestByQuality(clusters, scored).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).toSeq ==
      Seq((1L, 2L, 3L, 0.9), (4L, 4L, 1L, 0.1), (5L, 5L, 2L, 0.3)))
  }

  test("keepBestByQuality on real clusters: every cluster keeps exactly one member") {
    val pairs = Dedup.minhashLshDups(docs, shingleN = 3, numHashes = 16,
      bands = 4, threshold = 0.8)
    val clusters = Dedup.dupClusters(docs, pairs)
      .select($"doc_id", $"canonical_id")
    val scored = docs.select($"doc_id",
      TextFunctions.qualityScoreFromStats(TextFunctions.textStats($"text")).as("quality"))
    val kept = Dedup.keepBestByQuality(clusters, scored).cache()
    assert(kept.count() == clusters.select($"canonical_id").distinct().count())
    // the kept member's quality is the max of its cluster
    val joined = clusters.join(scored, "doc_id")
      .groupBy($"canonical_id".as("cluster_id")).agg(max($"quality").as("maxq"))
      .join(kept, "cluster_id")
    assert(joined.where($"kept_quality" =!= $"maxq").count() == 0)
    kept.unpersist()
  }

  test("outliers: flags are a per-label z-score gate and distances are nonnegative") {
    val r = EmbeddingQuality.outliers(emb, z = 2.0).cache()
    assert(r.count() == emb.count())
    assert(r.where($"dist" < 0).count() == 0)
    // some rows flagged, but always a small minority per label (z=2)
    val byLabel = r.groupBy($"label").agg(
      sum(when($"is_outlier", 1L).otherwise(0L)).as("n_out"),
      count(lit(1)).as("n"))
    assert(byLabel.where($"n_out" * 5 > $"n").count() == 0,
      "z=2 gate must flag well under 20% of any label")
    r.unpersist()
  }
}
