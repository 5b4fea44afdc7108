package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fingerprint

/** Result-cache semantics — the batch rendition of the reference's Redis
  * cache (SURVEY §2.1 S6/S7, §2.3 J7): a `cache(cache_key, payload,
  * expires_at)` table left-joined against incoming queries on the
  * fingerprint key; a hit (non-null, unexpired) bypasses the search path
  * (`distributed_search` steps 2-3, vector_search_cluster.py:206-211),
  * misses flow on and their results are appended with a TTL
  * (`_cache_result`, :399-412, skipping error rows :403-405 — P6).
  *
  * At scale the cache table is small relative to the corpus → broadcast
  * join, no shuffle of the query stream.
  */
object CacheSemantics {

  /** J7 — cache probe: left join queries to cache on cache_key with TTL
    * filter (`expires_at > now`); emits hit flag + payload. */
  def lookup(
      queries: DataFrame,
      cache: DataFrame,
      now: Column): DataFrame = {
    val validCache = cache
      .where(col("expires_at") > now)
      .select(col("cache_key"), col("payload"))
    queries
      .join(broadcast(validCache), Seq("cache_key"), "left")
      .withColumn("hit", col("payload").isNotNull)
  }

  /** S7 — cache append entries for fresh results: key → payload with
    * `expires_at = now + ttl` (SETEX semantics, :407-410), errors skipped
    * (P6, :403-405).
    *
    * `passThrough` names extra columns of `results` to carry alongside
    * the cache triple. Servers that must hand each requester ITS row
    * keep `query_id` here and project the triple off for the append —
    * joining served rows back to put rows by cache_key instead fans out
    * m×m when two in-flight misses share a key (duplicate embedding +
    * same k), emitting duplicate responses per query (ADVICE r11). */
  def put(
      results: DataFrame,
      keyCol: Column,
      payloadCol: Column,
      now: Column,
      ttlSeconds: Long,
      passThrough: Seq[String] = Nil): DataFrame = {
    val clean =
      if (results.columns.contains("error")) results.where(col("error").isNull)
      else results
    clean.select(passThrough.map(col) ++ Seq(
      keyCol.as("cache_key"),
      payloadCol.as("payload"),
      (now + lit(ttlSeconds)).as("expires_at")): _*)
  }

  /** Build a cache-key column for a vector+k query (P1). */
  def keyFor(vec: Column, k: Int): Column = Fingerprint.cacheKey(vec, lit(k))
}
