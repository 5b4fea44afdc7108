package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Exact brute-force k-NN — the Spark rendition of the reference's FLAT
  * index search path (`IndexFlatL2` build vector_search_cluster.py:1020-1021,
  * search :593, distributed merge :300-359).
  *
  * Shape: the (small) query set is broadcast against the (huge) vector
  * table; the per-query top-k is a `row_number()` window which Spark ≥3.5
  * executes as `WindowGroupLimit` — a per-partition bounded heap followed by
  * a final per-query heap, i.e. exactly the reference's partial/final top-k
  * merge (SURVEY §2.4 A1) without a global sort. At 100 TB the vector table
  * streams partition-parallel and only Q×k×partitions rows ever shuffle.
  */
object KnnSearch {

  /** For each row of `queries(query_id, qvec)`, the `k` nearest rows of
    * `vectors(vec_id, vec)` under `dist`, ties broken by vec_id.
    * Output: (query_id, rank, vec_id, dist) — relational form of the
    * reference's ragged top-k response (SURVEY §1.1).
    */
  def topK(
      queries: DataFrame,
      vectors: DataFrame,
      k: Int,
      queryIdCol: String = "query_id",
      queryVecCol: String = "qvec",
      vecIdCol: String = "vec_id",
      vecCol: String = "vec",
      dist: (Column, Column) => Column = Distances.l2SqFast,
      excludeSelf: Boolean = false): DataFrame = {

    val joined = vectors.crossJoin(broadcast(queries))
    val filtered =
      if (excludeSelf) joined.where(col(vecIdCol) =!= col(queryIdCol))
      else joined
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("dist"), col(vecIdCol))
    filtered
      .select(
        col(queryIdCol),
        col(vecIdCol),
        dist(col(queryVecCol), col(vecCol)).as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** FAISS `range_search` analog: every vector within `radiusSq`
    * (squared L2 — the same metric FAISS `IndexFlatL2.range_search`
    * takes) of each query. Unlike top-k the result is ragged —
    * data-dependent rows per query — so the relational form is simply
    * the filtered (query_id, vec_id, dist) set with no window at all.
    *
    * Scale: [[topK]] minus the top-k machinery — broadcast query set,
    * map-side distance + selective filter fused into the scan stage; at
    * 100 TB this is one shuffle-free pass with only matches surviving.
    */
  def rangeSearch(
      queries: DataFrame,
      vectors: DataFrame,
      radiusSq: Double,
      queryIdCol: String = "query_id",
      queryVecCol: String = "qvec",
      vecIdCol: String = "vec_id",
      vecCol: String = "vec",
      dist: (Column, Column) => Column = Distances.l2SqFast,
      excludeSelf: Boolean = false): DataFrame = {
    val joined = vectors.crossJoin(broadcast(queries))
    val filtered =
      if (excludeSelf) joined.where(col(vecIdCol) =!= col(queryIdCol))
      else joined
    filtered
      .select(
        col(queryIdCol),
        col(vecIdCol),
        dist(col(queryVecCol), col(vecCol)).as("dist"))
      .where(col("dist") <= radiusSq)
  }

  /** Self range-search over an embeddings table: first `numQueries`
    * vectors (by id) against the full table, excluding the query row.
    * Totally ordered on (query_id, vec_id) — dist is functionally
    * determined by the pair, so the order is unambiguous. */
  def selfRange(
      embeddings: DataFrame,
      numQueries: Int,
      radiusSq: Double,
      dist: (Column, Column) => Column = Distances.l2SqFast): DataFrame = {
    val q = embeddings
      .where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val v = embeddings.select(col("vec_id"), col("embedding").as("vec"))
    rangeSearch(q, v, radiusSq, excludeSelf = true, dist = dist)
      .select(col("query_id"), col("vec_id"), round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("vec_id"))
  }

  /** Self-kNN via the typed bounded-heap aggregator
    * (graft.functions.TopKAggregator) instead of the window — identical
    * results by construction (same (dist, vec_id) order); the UDAF path
    * ships at most k rows per (partition, query) in the partial phase. */
  def selfTopKViaAgg(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int,
      dist: (Column, Column) => Column = Distances.l2SqFast): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = embeddings
      .where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val scored = embeddings.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"),
        dist(col("qvec"), col("embedding")).as("dist"), col("vec_id"))
      .as[(Long, Double, Long)]
    val agg = new graft.functions.TopKAggregator(k)
    scored
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.toColumn.name("topk"))
      .toDF("query_id", "topk")
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("entry._2").as("vec_id"), round(col("entry._1"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** FAISS `IndexFlatIP` analog — maximum-inner-product search (MIPS),
    * the metric behind dot-product retrieval (DPR-style dense passage
    * search, unnormalized recommendation embeddings). Identical plan
    * shape to [[topK]] — broadcast queries, fused codegen dot product,
    * `WindowGroupLimit` top-k — but ranked by DESCENDING score (ties by
    * vec_id), and the output column is a similarity `score`, not a
    * distance. Cosine k-NN is NOT the same operator unless vectors are
    * pre-normalized; this is the un-normalized metric FAISS exposes as
    * `METRIC_INNER_PRODUCT`. */
  def selfTopKIp(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int): DataFrame = {
    val q = embeddings
      .where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    embeddings.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Distances.dotFast(col("qvec"), col("embedding")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("score"), 4).as("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Self-kNN over an embeddings table: the first `numQueries` vectors (by
    * id) act as queries against the full table, excluding the query row
    * itself. Mirrors the driver-contract query shape (FIXTURES.md). */
  def selfTopK(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int,
      dist: (Column, Column) => Column = Distances.l2SqFast): DataFrame = {
    val q = embeddings
      .where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val v = embeddings.select(col("vec_id"), col("embedding").as("vec"))
    topK(q, v, k, excludeSelf = true, dist = dist)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }
}
