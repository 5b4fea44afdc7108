package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FingerprintSpec extends SparkSpec {
  import spark.implicits._

  test("cacheKey formats first8+last8 as %.5f with query:/:k wrapper") {
    // 10-dim vector: first 8 = 0..7, last 8 = 2..9 (overlapping, per
    // vector_search_cluster.py:382 — no dedup)
    val v = (0 until 10).map(_.toFloat).toArray
    val key = Seq(1).toDF("x")
      .select(Fingerprint.cacheKey(typedLit(v), lit(10)).as("k"))
      .head().getString(0)
    val first8 = (0 until 8).map(i => f"${i.toFloat}%.5f")
    val last8 = (2 until 10).map(i => f"${i.toFloat}%.5f")
    assert(key == "query:" + (first8 ++ last8).mkString(",") + ":10")
  }

  test("fingerprint is stable (P1 property)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(20)
    val a = emb.select(Fingerprint.cacheKey($"embedding", lit(10))).collect()
    val b = emb.select(Fingerprint.cacheKey($"embedding", lit(10))).collect()
    assert(a.sameElements(b))
  }
}
