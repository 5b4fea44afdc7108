package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting (SURVEY §7.4 — IVF cluster sizes are
  * Zipf-ish, so cluster_id joins and hot-key aggregations skew). AQE's
  * skew-join splitting covers the join case at runtime; these operators
  * are the explicit plan-level form for when the skew is known up front.
  *
  * Results are exactly the unsalted results — the salt only changes the
  * shuffle distribution (partial aggregates spread over numSalts
  * sub-keys, then recombined).
  */
object Salting {

  /** Two-phase salted aggregation: count + sum grouped by `key`, with the
    * partial phase spread over (key, salt) so one hot key cannot pin a
    * single reducer. Salt is derived from the partition id — deterministic
    * per task, uniform across the cluster. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, numSalts: Int): DataFrame =
    df
      .withColumn("_salt", pmod(spark_partition_id(), lit(numSalts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("sum_value"))

  /** Salted equi-join for a skewed big side: the big side gets a salt in
    * [0, numSalts); the small side is replicated once per salt value; the
    * join key becomes (key, salt). Row multiset equals the unsalted join. */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      numSalts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt", pmod(spark_partition_id(), lit(numSalts)))
    val saltedSmall = small
      .withColumn("_salt", explode(sequence(lit(0), lit(numSalts - 1), lit(1))))
    saltedBig.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
