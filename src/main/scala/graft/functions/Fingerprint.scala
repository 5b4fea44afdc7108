package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Query-vector fingerprinting — the reference's cache key
  * (`_get_cache_key`, vector_search_cluster.py:378-387): concatenate the
  * first 8 and last 8 vector elements, format each as `%.5f`, join with
  * `,`, wrap as `query:<fp>:<k>`. Pure built-ins (SURVEY §2.2 P1). */
object Fingerprint {

  /** The 16-element sample the reference fingerprints (F8,
    * vector_search_cluster.py:382). */
  def sample16(vec: Column): Column =
    concat(slice(vec, 1, 8), slice(vec, -8, 8))

  /** `%.5f`-formatted, comma-joined fingerprint body (F2/F3). Elements are
    * cast to double before formatting so Spark and the DuckDB oracle round
    * the identical value. */
  def fingerprint(vec: Column): Column =
    concat_ws(",", transform(sample16(vec), x => format_string("%.5f", x.cast("double"))))

  /** Full cache key `query:<fp>:<k>` (vector_search_cluster.py:387). */
  def cacheKey(vec: Column, k: Column): Column =
    concat(lit("query:"), fingerprint(vec), lit(":"), k.cast("string"))
}
