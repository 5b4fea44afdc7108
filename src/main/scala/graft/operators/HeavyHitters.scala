package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAggregator

/** Exact heavy hitters without a full-cardinality shuffle: the two-pass
  * Misra–Gries pattern.
  *
  * Pass 1 runs the bounded-state MG sketch (≤ k counters per partial
  * buffer) — its candidate set is guaranteed to contain every key with
  * count > n/(k+1), plus possibly some below. Pass 2 re-counts ONLY the
  * ≤ k candidates exactly (a broadcast-filter + tiny groupBy) and keeps
  * those strictly above the threshold.
  *
  * The output is deterministic and exact — "all keys with count >
  * floor(n/(k+1)), with exact counts" — even though the intermediate
  * candidate set depends on partition order, because the guarantee makes
  * every qualifying key survive pass 1 and the exact filter in pass 2
  * removes the order-dependent extras.
  *
  * Scale design: a plain groupBy-count-filter shuffles one record per
  * DISTINCT key (unbounded at corpus scale — think URL or n-gram keys);
  * here the shuffled state is ≤ k counters per partition in pass 1 and
  * ≤ k keys' worth of rows in pass 2's aggregate.
  */
object HeavyHitters {

  /** All values of `keyCol` (a long) whose count exceeds
    * floor(n/(k+1)), with exact counts. */
  def exactAboveThreshold(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("long")).as[Long]
    val n = keys.count()
    val threshold = n / (k + 1) // integer floor
    val mg = new MisraGriesAggregator(k)
    val candidates: Seq[Long] =
      keys.select(mg.toColumn).head().keys.toSeq // ≤ k — control-plane small
    df.where(col(keyCol).isin(candidates: _*))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > threshold)
  }
}
