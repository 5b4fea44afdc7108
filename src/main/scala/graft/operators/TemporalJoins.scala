package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-aware joins for the metrics/training-pipeline surface: as-of
  * ("latest prior reading") and interval-containment joins — the two
  * temporal joins a naive Spark translation turns into range cross
  * products.
  *
  * Scale design:
  *   - [[asofJoin]] is the union-window form: tag both sides, union,
  *     ONE sort-shuffle on the key, running `last(..., ignoreNulls)`
  *     window, filter back to probes. No O(probes × refs) pair
  *     generation, no per-row range scan — cost is a single
  *     sort-merge pass regardless of how many refs precede each probe.
  *   - [[intervalJoinBinned]] quantizes time into interval-length bins:
  *     an interval of length L overlaps at most two L-wide bins, so each
  *     anchor explodes to ≤2 (key, bin) rows and the join is a plain
  *     equi-join on (key, bin) with an exact containment re-check.
  *     Candidate fan-out is bounded by events-per-bin, never all pairs
  *     within a key.
  */
object TemporalJoins {

  /** As-of join: for each probe row, the ref row with the greatest
    * `timeCol` ≤ the probe's (inclusive — a ref at exactly the probe's
    * time matches, same as an ASOF `probe.t >= ref.t` predicate).
    * Probes with no prior ref get nulls.
    *
    * Precondition for deterministic output: `refs` must be unique per
    * (`keyCol`, `timeCol`) — dedupe with [[latestPerKeyTime]] first if
    * not. Probe rows need no such restriction (ref rows sort before
    * probe rows at equal time, so every probe at a tied instant sees the
    * same ref).
    *
    * Output: all probe columns, plus `asof_<c>` for each ref value
    * column and `asof_<timeCol>` for the matched ref time.
    */
  def asofJoin(probes: DataFrame, refs: DataFrame, keyCol: String,
      timeCol: String, valueCols: Seq[String]): DataFrame = {
    val refTagged = refs.select(
      (Seq(col(keyCol), col(timeCol)) ++
        valueCols.map(c => col(c).as(s"_ref_$c"))): _*)
      .withColumn("_tag", lit(0))
    val probeTagged = probes.withColumn("_tag", lit(1))
    val u = probeTagged.unionByName(refTagged, allowMissingColumns = true)
    // refs (_tag 0) sort before probes (_tag 1) at equal time → inclusive
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRefs = valueCols.foldLeft(u) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"_ref_$c"), ignoreNulls = true).over(w))
    }.withColumn(s"asof_$timeCol",
      last(when(col("_tag") === 0, col(timeCol)), ignoreNulls = true).over(w))
    withRefs
      .where(col("_tag") === 1)
      .drop("_tag")
      .drop(valueCols.map(c => s"_ref_$c"): _*)
  }

  /** Dedupe helper for [[asofJoin]]'s precondition: one ref per
    * (`keyCol`, `timeCol`), keeping the row with the greatest
    * `tieBreak`. */
  def latestPerKeyTime(refs: DataFrame, keyCol: String, timeCol: String,
      tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol), col(timeCol))
      .orderBy(col(tieBreak).desc)
    refs.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** Interval-containment join: pair each event with every anchor of the
    * same key whose window `[anchor.t, anchor.t + lenSec)` contains the
    * event's time.
    *
    * Both sides are quantized to `lenSec`-wide bins of epoch micros; an
    * anchor's half-open window spans at most two consecutive bins, so
    * anchors explode to ≤2 bin rows, events to exactly 1, and the join
    * is an equi-join on (key, bin) + exact predicate — the bin match is
    * a complete candidate set (any contained event's bin is one of the
    * anchor's two), so no pair is missed.
    *
    * Output: all event columns plus `_anchor_id` (the anchor's
    * `anchorIdCol`) and `_anchor_us` (anchor window start, epoch
    * micros). */
  def intervalJoinBinned(events: DataFrame, anchors: DataFrame,
      keyCol: String, timeCol: String, anchorIdCol: String,
      lenSec: Long): DataFrame = {
    val lenUs = lenSec * 1000000L
    val a = anchors.select(
        col(anchorIdCol).as("_anchor_id"),
        col(keyCol).as("_a_key"),
        unix_micros(col(timeCol)).as("_anchor_us"))
      // integer DIV: exact past 2^53, unlike a double quotient
      .withColumn("_bin", explode(array_distinct(array(
        expr(s"_anchor_us DIV $lenUs"),
        expr(s"(_anchor_us + ${lenUs - 1}) DIV $lenUs")))))
    val e = events
      .withColumn("_e_us", unix_micros(col(timeCol)))
      .withColumn("_bin", expr(s"_e_us DIV $lenUs"))
    e.join(a,
        e("_bin") === a("_bin") && col(keyCol) === col("_a_key") &&
          col("_e_us") >= col("_anchor_us") &&
          col("_e_us") < col("_anchor_us") + lit(lenUs))
      .drop("_bin", "_a_key", "_e_us")
  }
}
