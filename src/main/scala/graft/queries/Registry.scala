package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.KnnSearch

/** Named-query registry binding operators to the driver's test tables.
  *
  * Conventions (FIXTURES.md): every query ends in a total ORDER BY; doubles
  * rounded to 4 decimals; counts/ranks cast to long to match DuckDB BIGINT;
  * distances computed in double with left-to-right folds for bit parity.
  */
object Registry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1 + A1 + O1/O2: exact FLAT k-NN, squared L2, ties by vec_id
    // (vector_search_cluster.py:593, :1020-1021, :300-359)
    "q_flat_knn" -> ((s, dir) =>
      KnnSearch.selfTopK(t(s, dir, "embeddings"), numQueries = 8, k = 10))
  )

  /** DuckDB L2² snippet shared by oracle queries: index-based lambda fold,
    * double precision, same evaluation order as Distances.l2Sq. */
  private val l2sq =
    """list_sum(list_transform(range(1, len(q.qvec)+1),
      | i -> (CAST(q.qvec[i] AS DOUBLE) - CAST(v.embedding[i] AS DOUBLE))^2))""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_flat_knn" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 8
         |), j AS (
         |  SELECT q.query_id, v.vec_id, $l2sq AS dist
         |  FROM q CROSS JOIN embeddings v
         |  WHERE v.vec_id <> q.query_id
         |), r AS (
         |  SELECT query_id, vec_id, dist,
         |         row_number() OVER (PARTITION BY query_id ORDER BY dist, vec_id) AS rank
         |  FROM j
         |)
         |SELECT query_id, rank, vec_id, round(dist, 4) AS dist
         |FROM r WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin
  )
}
