package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operational-analytics operators — batch renditions of the reference's
  * metrics surface (SURVEY §2.4 A5-A8, §2.5 O4, §2.9 T3) over an event
  * stream table: latency percentiles (`get_metrics`,
  * vector_search_cluster.py:414-436, 725-733), monotone counters, cache hit
  * rate (:427-429), health counts (:431-434), the rolling last-N window
  * (:240-241, 602-603), and tumbling event-time windows (the event-time
  * upgrade of the reference's 5 s processing-time heartbeat, :757).
  *
  * All are single-shuffle grouped aggregations with map-side partial
  * aggregation — linear scans at 100 TB.
  */
object MetricsAnalytics {

  /** A6/A10 — counters per group: event counts, value totals, distinct
    * actors. */
  def counters(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))

  /** A5 — exact latency percentiles p50/p95/p99/p99.9 + mean per group
    * (sort+positional-index in the reference, :419-425; p99.9 per the
    * README monitoring surface, README.md:168-173; here one pass of
    * `percentile`, continuous interpolation — same definition DuckDB's
    * quantile_cont uses). */
  def percentiles(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(percentile(col("value"),
          array(lit(0.5), lit(0.95), lit(0.99), lit(0.999))).as("ps"),
        avg(col("value")).as("avg_v"))
      .select(
        col("event_type"),
        round(col("ps").getItem(0), 4).as("p50"),
        round(col("ps").getItem(1), 4).as("p95"),
        round(col("ps").getItem(2), 4).as("p99"),
        round(col("ps").getItem(3), 4).as("p999"),
        round(col("avg_v"), 4).as("avg_value"))
      .orderBy(col("event_type"))

  /** Bounded-memory form of [[percentiles]] for the 100 TB regime: exact
    * `percentile` buffers every value per group (fine for the
    * reference's last-1000 windows and the oracle gate; an OOM hazard on
    * unbounded groups at corpus scale). `approx_percentile` holds a
    * fixed-size sketch per group — same columns, accuracy-bounded
    * values (spec-checked against the exact form). */
  def percentilesApprox(events: DataFrame, accuracy: Int = 10000): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("value"),
          array(lit(0.5), lit(0.95), lit(0.99), lit(0.999)), lit(accuracy)).as("ps"),
        avg(col("value")).as("avg_v"))
      .select(
        col("event_type"),
        round(col("ps").getItem(0), 4).as("p50"),
        round(col("ps").getItem(1), 4).as("p95"),
        round(col("ps").getItem(2), 4).as("p99"),
        round(col("ps").getItem(3), 4).as("p999"),
        round(col("avg_v"), 4).as("avg_value"))
      .orderBy(col("event_type"))

  /** Bounded-memory form of [[counters]]: exact `countDistinct` expands
    * to a per-group distinct set; the HLL++ sketch keeps it O(1) per
    * group at corpus scale (rsd-bounded, spec-checked). */
  def countersApprox(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"),
        approx_count_distinct(col("user_id"), rsd).as("n_users"))
      .orderBy(col("event_type"))

  /** A7/A8 — hit-rate style ratio: rows matching `hit` over all rows
    * (cache_hits / total_queries, :427-429; healthy/total, :431-434). */
  def hitRate(events: DataFrame, hit: Column): DataFrame =
    events.agg(
      count(lit(1)).as("total"),
      sum(hit.cast("long")).as("hits"),
      round(sum(hit.cast("long")) / count(lit(1)), 6).as("hit_rate"))

  /** O4 — rolling last-N aggregate per group ordered by event time (the
    * reference's `latencies[-1000:]` trim, :240-241): a bounded
    * rows-window. Emits the EXACT fixed-point numerator (sum of latency
    * cents — integers in double, order-independent) and the window count;
    * the mean is sum/(100·n). Emitting a rounded quotient is not
    * engine-portable: true decimal ties (e.g. 163593/2400 = 68.16375)
    * round differently under Spark's HALF_UP-on-decimal-repr vs rounding
    * the binary double. */
  def rollingMean(events: DataFrame, lastN: Int): DataFrame = {
    val w = Window
      .partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(lastN - 1), 0)
    events
      .select(
        col("event_id"), col("event_type"),
        sum(round(col("value") * 100)).over(w).cast("long").as("rolling_sum_cents"),
        count(lit(1)).over(w).as("n_window"))
      .orderBy(col("event_id"))
  }

  /** T2 batch analog — node registry health: nodes synthesized from the
    * event stream (user_id mod numNodes), health = heartbeat within
    * `timeoutSec` of the registry's freshest heartbeat — the stale-node
    * expiry the reference forgot (SURVEY §2.9 T2). */
  def nodeHealthBatch(events: DataFrame, numNodes: Int, timeoutSec: Long): DataFrame = {
    // materialized once (numNodes rows): `now` is derived from the same
    // aggregate — without it the full event scan runs twice. Checkpoint
    // blocks are GC'd with the result, unlike a persist() entry that
    // leaks in the CacheManager without an explicit unpersist.
    val agg = events
      .groupBy(pmod(col("user_id"), lit(numNodes.toLong)).as("node_num"))
      .agg(count(lit(1)).as("n_events"),
        max(unix_timestamp(col("ts"))).as("last_hb"))
      .localCheckpoint(true)
    val now = agg.agg(max(col("last_hb")).as("now_ts"))
    agg.crossJoin(broadcast(now))
      .select(
        concat(lit("node-"), col("node_num").cast("string")).as("node_id"),
        col("n_events"), col("last_hb"),
        when(col("now_ts") - col("last_hb") <= timeoutSec, "healthy")
          .otherwise("stale").as("health"))
      .orderBy(col("node_id"))
  }

  /** T3 — tumbling event-time window aggregation (event-time strengthening
    * of the reference's processing-time-only metrics, SURVEY §2.9):
    * count + sum per (window, event_type). Window start emitted as epoch
    * seconds for engine-portable comparison. */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(
        unix_timestamp(col("w.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Exponentially time-decayed counters — the "decayed popularity"
    * metric of ops dashboards and caches (Cormode et al. 2009 forward-
    * decay framing): each event contributes 2^(−Δt/halfLife) at the
    * reference instant, so a key's decayed count is its recency-weighted
    * activity. Reference time = the corpus max timestamp (deterministic
    * from the data — no wall clock, which would break replay).
    *
    * Scale: one map-side contribution per event; the per-key sum is a
    * TWO-LEVEL timestamp-ordered fold (the [[unigramNll]] bit-parity
    * discipline, bounded): contributions first fold inside fixed time
    * BUCKETS (`bucketSeconds` wide — the aggregation buffer is
    * O(events-per-bucket-per-key), not O(events-per-key), so a hot key
    * can no longer accumulate the whole corpus into one in-memory list),
    * then the ≤ |buckets| partials fold in bucket order. Both levels are
    * deterministic left folds over sorted lists, and the DuckDB oracle
    * replays the identical two-level shape, so parity is structural —
    * equal-timestamp ties land in the same bucket and carry equal
    * contributions, which commute exactly. Output: (event_type,
    * n_events, decayed) ordered. */
  def decayedCounts(
      events: DataFrame,
      halfLifeSeconds: Double,
      bucketSeconds: Long = 3600L): DataFrame = {
    val refUs = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val lambda = math.log(2.0) / halfLifeSeconds
    val dtSec = (lit(refUs) - unix_micros(col("ts"))).cast("double") / 1e6
    val contrib = exp(lit(-lambda) * dtSec)
    val bucketUs = bucketSeconds * 1000000L
    val partials = events
      .select(col("event_type"), unix_micros(col("ts")).as("us"), contrib.as("c"))
      .withColumn("bkt", expr(s"us DIV ${bucketUs}L"))
      .groupBy(col("event_type"), col("bkt"))
      .agg(count(lit(1)).as("n"),
        sort_array(collect_list(struct(col("us"), col("c")))).as("lst"))
      .select(col("event_type"), col("bkt"), col("n"),
        aggregate(col("lst"), lit(0.0d),
          (acc, x) => acc + x.getField("c")).as("partial"))
    partials
      .groupBy(col("event_type"))
      .agg(sum(col("n")).cast("long").as("n_events"),
        sort_array(collect_list(struct(col("bkt"), col("partial")))).as("plst"))
      .select(col("event_type"), col("n_events"),
        round(aggregate(col("plst"), lit(0.0d),
          (acc, x) => acc + x.getField("partial")), 6).as("decayed"))
      .orderBy(col("event_type"))
  }
}
