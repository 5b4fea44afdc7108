package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed as a named query
  * in [[queries]]; SQL-expressible ones have a DuckDB oracle in
  * [[oracleSql]]. The implementations live under graft.operators /
  * graft.functions; graft.queries.Registry wires them to the test tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact FLAT k-NN (SURVEY §3.1): 8 query vectors against the full
    * embeddings table, top-10 by squared L2. */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("q_flat_knn")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
