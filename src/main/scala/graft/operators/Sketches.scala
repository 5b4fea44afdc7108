package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality/frequency sketches — HyperLogLog (Flajolet et
  * al. 2007) and Count-Min (Cormode & Muthukrishnan 2005) — as PORTABLE
  * deterministic DataFrame operators.
  *
  * Why re-implement what `approx_count_distinct` already does: (1) the
  * REGISTER/COUNTER TABLES are first-class DataFrames here, so sketches
  * persist, union across days, and merge with plain `groupBy(...).max`
  * / `+` — the property that makes sketches the 100 TB answer to
  * "distinct users per day, rolled up monthly" without re-scanning
  * history; Spark's built-in keeps its HLL buffer opaque inside one
  * aggregation. (2) every hash is md5-derived, so DuckDB replays the
  * ENTIRE sketch — registers, estimate, error — and the oracle
  * hash-checks it per round (the built-in's xxhash/HLL++ internals are
  * not SQL-replayable).
  *
  * Scale shape: both sketches are map-side aggregations into
  * model-plane-sized state (m registers / d·w counters) — the shuffle
  * carries the SKETCH, never the keys. Merging k partial sketches is a
  * ≤ k·m-row groupBy.
  *
  * All arithmetic that crosses the oracle boundary is engine-exact:
  * register values are integers; the HLL harmonic sum Σ 2^−ρ is a sum
  * of ≤ m dyadic rationals with spread < 53 bits, hence EXACTLY
  * representable in double in any summation order; the estimate is
  * floored to a long after one multiply/divide of identical doubles.
  */
object Sketches {

  /** Portable 32-bit key hash: first 8 md5 hex chars. DuckDB:
    * ('0x'||substr(md5(k),1,8))::BIGINT. */
  private def h32(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** HLL register table for `keyCol`: (bucket, rho) with one row per
    * OCCUPIED bucket, bucket = h mod m, ρ = (position of the leading
    * 1-bit of the remaining 32−log2(m) bits) via the integer-exact
    * `bits − length(bin(w)) + 1` identity — no floating log anywhere.
    * Merge two register tables by `unionAll.groupBy(bucket).max(rho)`. */
  def hllRegisters(df: DataFrame, keyCol: String, m: Int = 64): DataFrame =
    hllRegistersBy(df, keyCol, m, Nil)

  /** [[hllRegisters]] with extra grouping columns — one register table
    * per group in ONE aggregation pass (distinct-per-time-window, per
    * source, per shard …). Output: (groups…, bucket, rho); rollups
    * max-merge across any subset of groups. */
  def hllRegistersBy(df: DataFrame, keyCol: String, m: Int,
      groups: Seq[String]): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two, got $m")
    val p = Integer.numberOfTrailingZeros(m)
    val bits = 32 - p
    val h = h32(col(keyCol))
    val w = shiftright(h, p) // remaining high bits, 0 .. 2^bits-1 (h >= 0)
    // bin(w) has no leading zeros ⇒ length = floor(log2 w)+1; w=0 ⇒ all
    // `bits` leading zeros ⇒ ρ = bits+1
    val rho = when(w === 0L, lit(bits + 1))
      .otherwise(lit(bits + 1) - length(bin(w)))
    df.select(groups.map(col) :+ pmod(h, lit(m.toLong)).as("bucket")
        :+ rho.cast("long").as("rho"): _*)
      .groupBy((groups :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** One-row HLL estimate from a register table: the raw HLL estimator
    * α_m·m²/Σ2^−ρ (empty registers contribute 2⁰ = 1 each), floored to
    * a long. The small-range `m·ln(m/V)` correction is intentionally
    * NOT applied — it crosses through `ln` (engine-inexact) and the
    * caller sees `v_zero` to judge whether the raw estimate is in its
    * accurate regime (v_zero = 0 ⇒ it is). Output: (m, v_zero,
    * est_distinct). */
  def hllEstimate(registers: DataFrame, m: Int): DataFrame =
    hllEstimateBy(registers, m, Nil)

  /** [[hllEstimate]] per group (matching [[hllRegistersBy]] output).
    * Output: (groups…, m, v_zero, est_distinct). */
  def hllEstimateBy(registers: DataFrame, m: Int, groups: Seq[String]): DataFrame = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val agged =
      if (groups.isEmpty)
        registers.agg(count(lit(1)).as("occupied"),
          sum(pow(lit(2.0d), -col("rho").cast("double"))).as("s_occ"))
      else
        registers.groupBy(groups.map(col): _*)
          .agg(count(lit(1)).as("occupied"),
            sum(pow(lit(2.0d), -col("rho").cast("double"))).as("s_occ"))
    agged.select(groups.map(col) ++ Seq(
      lit(m.toLong).as("m"),
      (lit(m.toLong) - col("occupied")).as("v_zero"),
      floor(lit(alpha) * lit(m.toDouble) * lit(m.toDouble) /
        (col("s_occ") + (lit(m.toLong) - col("occupied")).cast("double")))
        .cast("long").as("est_distinct")): _*)
  }

  /** Count-Min counter table for `keyCol`: (row, slot, cnt), d rows ×
    * w slots, hash_i(k) = md5(i:k) mod w. Merge across batches by
    * `unionAll.groupBy(row, slot).sum(cnt)`. Scale: d map-side grouped
    * counts into d·w cells — the shuffle is sketch-sized. */
  def countMinTable(df: DataFrame, keyCol: String, d: Int = 4, w: Int = 256): DataFrame =
    df.select(col(keyCol).cast("string").as("k"),
        explode(sequence(lit(0), lit(d - 1))).as("row"))
      .select(col("row"),
        pmod(h32(concat_ws(":", col("row"), col("k"))), lit(w.toLong)).as("slot"))
      .groupBy(col("row"), col("slot"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate `candidates`' frequencies from a Count-Min table:
    * est = min over rows of the addressed cell (the classic one-sided
    * overestimate: est ≥ true, est ≤ true + εn w.h.p.). `candidates`
    * needs a `k` column; output (k, est) — join-shaped so a
    * heavy-hitter recount or an error audit rides on top. */
  def countMinLookup(cms: DataFrame, candidates: DataFrame, d: Int = 4,
      w: Int = 256): DataFrame =
    candidates.select(col("k").cast("string").as("k"),
        explode(sequence(lit(0), lit(d - 1))).as("row"))
      .select(col("k"), col("row"),
        pmod(h32(concat_ws(":", col("row"), col("k"))), lit(w.toLong)).as("slot"))
      .join(cms, Seq("row", "slot"), "left")
      .groupBy(col("k"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
