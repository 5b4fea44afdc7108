package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("dupPairs stays within clusters, a < b, and respects tau") {
    val cents = IvfIndex.seedCentroids(emb, 8)
    val pairs = SemanticDedup.dupPairs(emb, cents, tau = 0.3).collect()
    assert(pairs.nonEmpty, "tau too high for the fixture")
    pairs.foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      assert(r.getAs[Double]("cos_sim") >= 0.3)
    }
    // every pair's two sides really share the cluster assignment
    val assigned = IvfIndex.assign(emb, cents)
      .select($"vec_id", $"cluster_id").as[(Long, Long)].collect().toMap
    pairs.foreach { r =>
      assert(assigned(r.getAs[Long]("vec_a")) == r.getAs[Long]("cluster_id"))
      assert(assigned(r.getAs[Long]("vec_b")) == r.getAs[Long]("cluster_id"))
    }
  }

  test("verdicts: one row per vector; is_dup iff a lower-id within-cell neighbor") {
    val cents = IvfIndex.seedCentroids(emb, 8)
    val n = emb.count()
    val v = SemanticDedup.verdicts(emb, cents, tau = 0.3)
    assert(v.count() == n)
    val dupIds = SemanticDedup.dupPairs(emb, cents, tau = 0.3)
      .select($"vec_b").distinct().as[Long].collect().toSet
    val got = v.where($"is_dup").select($"vec_id").as[Long].collect().toSet
    assert(got == dupIds)
    // the lowest id of any cluster can never be a dup
    val firstPerCluster = IvfIndex.assign(emb, cents)
      .groupBy($"cluster_id").agg(min($"vec_id").as("first_id"))
      .select($"first_id").as[Long].collect().toSet
    assert(firstPerCluster.intersect(got).isEmpty)
  }
}
