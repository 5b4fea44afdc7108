package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbeddingPool

class EmbeddingPoolSpec extends SparkSpec {
  import spark.implicits._

  test("meanPool averages per key and dimension") {
    val df = Seq(
      (0, Array(1.0f, 2.0f)),
      (0, Array(3.0f, 4.0f)),
      (1, Array(10.0f, 20.0f))
    ).toDF("label", "embedding")
    val out = EmbeddingPool.meanPool(df, "label")
      .orderBy($"label", $"dim")
      .as[(Int, Long, Long, Double)].collect()
    assert(out === Seq(
      (0, 0L, 2L, 2.0), (0, 1L, 2L, 3.0),
      (1, 0L, 1L, 10.0), (1, 1L, 1L, 20.0)))
  }

  test("meanPool on real embeddings: one row per (label, dim), means bounded") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val nLabels = emb.select($"label").distinct().count()
    val out = EmbeddingPool.meanPool(emb, "label")
    assert(out.count() === nLabels * 64)
    // a mean must lie within the column's min..max envelope
    val bad = out.where(abs($"mean") > 100.0).count()
    assert(bad === 0L)
  }
}
