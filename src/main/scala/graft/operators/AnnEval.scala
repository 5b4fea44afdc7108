package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN quality evaluation — the recall@k harness as a first-class
  * operator (the reference validates its indexes the same way: exact
  * FLAT results as ground truth, set overlap per query).
  *
  * Scale design: both inputs are top-k result sets (Q×k rows — tiny by
  * construction regardless of corpus size), so the overlap join is a
  * broadcast hash join; nothing here touches the corpus. Ground truth at
  * 100 TB comes from the FLAT path on a query sample, which is exactly
  * how recall is measured in practice.
  */
object AnnEval {

  /** Per-query overlap counts: `n_hit` = |approx ∩ exact|, `n_exact` =
    * |exact| — integer outputs so the result is engine-exact (a rounded
    * recall ratio hits the decimal-tie trap; callers divide). Inputs
    * need (query_id, vec_id) columns. */
  def recallCounts(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("query_id"), col("vec_id"))
      .withColumn("_hit", lit(1L))
    exact.select(col("query_id"), col("vec_id"))
      .join(broadcast(a), Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("_hit"), lit(0L))).as("n_hit"),
        count(lit(1)).as("n_exact"))
  }

  /** [[recallCounts]] plus the recall ratio as a double (display form —
    * not for oracle comparison). */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame =
    recallCounts(approx, exact)
      .withColumn("recall", col("n_hit").cast("double") / col("n_exact"))

  /** Macro-averaged recall over all queries — the single quality number
    * quoted in index benchmarks. */
  def meanRecall(approx: DataFrame, exact: DataFrame): Double = {
    val r = recallAtK(approx, exact).agg(avg(col("recall"))).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** One summary row per index family for the per-round recall report:
    * micro recall over all queries, with the ratio as PER-MILLE under
    * INTEGER floor division (`n_hit*1000 div n_exact`) — exact in any
    * engine, immune to the double-rounding decimal-tie trap a
    * `round(x, 3)` would hit. Output: (family, n_queries, n_exact,
    * n_hit, recall_pm). */
  def recallReportRow(family: String, approx: DataFrame, exact: DataFrame): DataFrame =
    recallCounts(approx, exact)
      .agg(count(lit(1)).as("nq"), sum(col("n_hit")).as("h"),
        sum(col("n_exact")).as("e"))
      .select(lit(family).as("family"),
        col("nq").cast("long").as("n_queries"),
        col("e").cast("long").as("n_exact"),
        col("h").cast("long").as("n_hit"),
        expr("h * 1000 div e").cast("long").as("recall_pm"))
}
