package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CacheSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("lookup: unexpired entries hit, expired or absent miss") {
    val queries = Seq(("k1", 1L), ("k2", 2L), ("k3", 3L))
      .toDF("cache_key", "query_id")
    val cache = Seq(
      ("k1", "r1", 2000L),  // valid
      ("k2", "r2", 500L))   // expired
      .toDF("cache_key", "payload", "expires_at")
    val got = CacheSemantics.lookup(queries, cache, lit(1000L))
      .orderBy($"query_id")
      .select($"query_id", $"hit", $"payload").collect()
    assert(got.map(_.getBoolean(1)).toSeq == Seq(true, false, false))
    assert(got.head.getString(2) == "r1")
  }

  test("put: TTL applied, error rows skipped (P6)") {
    val results = Seq(
      ("k1", "ok", null.asInstanceOf[String]),
      ("k2", "bad", "err"))
      .toDF("cache_key", "res", "error")
    val got = CacheSemantics.put(results, $"cache_key", $"res", lit(100L), 3600L)
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("cache_key") == "k1")
    assert(got.head.getAs[Long]("expires_at") == 3700L)
  }
}
