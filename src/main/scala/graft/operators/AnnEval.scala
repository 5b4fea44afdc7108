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

  /** One sweep-dashboard row: micro recall of `approx` vs `exact` as
    * (labelCol = labelValue, n_hit, n_exact, recall_pm) — the
    * integer-floor per-mille discipline of [[recallReportRow]] shared
    * by every knob sweep (q_ivf_sweep's nprobe, q_rerank_sweep's
    * shortlist) so the arithmetic lives in exactly one place. */
  def recallSweepRow(
      labelCol: String,
      labelValue: Long,
      approx: DataFrame,
      exact: DataFrame): DataFrame =
    recallCounts(approx, exact)
      .agg(sum(col("n_hit")).as("h"), sum(col("n_exact")).as("e"))
      .select(lit(labelValue).as(labelCol),
        col("h").cast("long").as("n_hit"),
        col("e").cast("long").as("n_exact"),
        expr("h * 1000 div e").cast("long").as("recall_pm"))

  /** The whole sweep dashboard in ONE join when the approx table is
    * label-PARTITIONED (each row tagged with its knob value in
    * `labelCol` and the rungs' row sets disjoint — q_hnsw_sweep's
    * shape): exact × labels left-joins the tagged approx once, and a
    * grouped aggregate yields every [[recallSweepRow]] value — same
    * integer per-mille floor-div arithmetic, one pass instead of one
    * join per rung. Prefix-style sweeps (q_ivf_sweep, whose settings
    * share rows) keep the per-setting filter form. */
  def recallSweepRows(
      labelCol: String,
      labelValues: Seq[Long],
      approx: DataFrame,
      exact: DataFrame): DataFrame = {
    val spark = approx.sparkSession
    import spark.implicits._
    val labels = labelValues.toDF(labelCol)
    val a = approx.select(col(labelCol), col("query_id"), col("vec_id"))
      .withColumn("_hit", lit(1L))
    labels.crossJoin(exact.select(col("query_id"), col("vec_id")))
      .join(broadcast(a), Seq(labelCol, "query_id", "vec_id"), "left")
      .groupBy(col(labelCol))
      .agg(sum(coalesce(col("_hit"), lit(0L))).as("h"),
        count(lit(1)).as("e"))
      .select(col(labelCol).cast("long").as(labelCol),
        col("h").cast("long").as("n_hit"),
        col("e").cast("long").as("n_exact"),
        expr("h * 1000 div e").cast("long").as("recall_pm"))
      .orderBy(col(labelCol))
  }

  /** The PREFIX-rung sweep dashboard in one window pass + one grading
    * join (r9 verdict item 7 — extends the [[recallSweepRows]] one-join
    * discipline to sweeps whose rungs SHARE rows): candidates carry a
    * prefix-rank column (q_rerank_sweep's adc_rank, q_ivf_sweep's
    * probe_rank) and rung `sl`'s result is the top-k by (dist, vec_id)
    * among rows with prefixRank ≤ sl. A candidate's rank at rung sl is
    * the inclusive running count of rows with prefixRank ≤ sl in
    * (dist, vec_id) order — so ONE window evaluates every rung's
    * ranking simultaneously (|settings| conditional running sums), an
    * explode tags each candidate with the rungs whose top-k it enters
    * (disjoint tagged rows by construction), and the whole dashboard
    * grades in the single [[recallSweepRows]] join. Row-for-row equal
    * to the per-rung filter+row_number+join form it replaces. */
  def prefixSweepRows(
      labelCol: String,
      settings: Seq[Long],
      candidates: DataFrame,
      prefixRankCol: String,
      k: Int,
      exact: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("dist"), col("vec_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val rankCols = settings.map(sl =>
      sum(when(col(prefixRankCol) <= sl, 1L).otherwise(0L)).over(w).as(s"_r$sl"))
    val ranked = candidates.select(
      Seq(col("query_id"), col("vec_id"), col(prefixRankCol)) ++ rankCols: _*)
    val rankAt = settings.tail.foldLeft(
      when(col(labelCol) === settings.head, col(s"_r${settings.head}"))) {
      (acc, sl) => acc.when(col(labelCol) === sl, col(s"_r$sl"))
    }
    val tagged = ranked
      .withColumn(labelCol, explode(array(settings.map(lit(_)): _*)))
      .where(col(prefixRankCol) <= col(labelCol) && rankAt <= k)
    recallSweepRows(labelCol, settings, tagged, exact)
  }

  /** Per-vector reconstruction error for the compression ladder — the
    * FAISS sa_encode/sa_decode quantization-error diagnostic: a vector's
    * distance to its OWN code IS the reconstruction SSE, so each family
    * row reuses that family's oracled distance kernel (SQ8/SQ4
    * reconstruct-and-fold, PQ ADC against its own code — the ADC sum of
    * per-subspace argmin distances). One row per (family, vec_id) over
    * a fixed slice: per-vector folds are order-pinned (ascending dim /
    * subspace), so every value replays exactly in the oracle, whereas a
    * corpus-level MSE would break double-sum order parity — and the
    * per-vector form is the more useful artifact anyway (it ranks which
    * vectors quantize worst, the outlier check run before committing to
    * a compression rung). Bounds/codebooks come from the FULL corpus
    * (same training plane as the search queries); only the reported
    * slice is scored — map-side, no shuffle beyond the union. */
  def quantErrorReport(
      embeddings: DataFrame,
      fromVec: Int,
      numVecs: Int,
      d: Int,
      m: Int,
      subDim: Int,
      ksub: Int): DataFrame = {
    // score a slice DISJOINT from the PQ seed codewords (vec_id < ksub)
    // — a codeword reconstructs itself with zero error, which would make
    // the pq rows a degenerate diagnostic
    val slice = embeddings.where(
      col("vec_id") >= fromVec && col("vec_id") < fromVec + numVecs)
    // one bounds pass trains both SQ rungs (scales derived directly
    // from the shared exact bounds — bit-identical to separate passes)
    val (vmin, Seq(s8, s4)) =
      SqIndex.trainBoundsMulti(embeddings, d, Seq(255.0, 15.0))
    val sq8 = SqIndex.encode(slice, vmin, s8)
      .select(lit("sq8").as("family"), col("vec_id"),
        round(SqIndex.sqDist(col("embedding"), col("codes"), d, vmin, s8), 4)
          .as("sse"))
    val sq4 = slice
      .withColumn("packed", SqIndex.encode4Expr(col("embedding"), vmin, s4))
      .select(lit("sq4").as("family"), col("vec_id"),
        round(SqIndex.sq4Dist(col("embedding"), col("packed"), d, vmin, s4), 4)
          .as("sse"))
    val cb = PqIndex.seedCodebooks(embeddings, m, subDim, ksub)
    val pq = PqIndex.encode(slice, cb, m, subDim)
      .select(lit("pq").as("family"), col("vec_id"),
        round(PqIndex.adcDist(
          PqIndex.lutExpr(col("embedding"), cb, m, subDim), col("codes"), m), 4)
          .as("sse"))
    sq8.unionByName(sq4).unionByName(pq)
  }
}
