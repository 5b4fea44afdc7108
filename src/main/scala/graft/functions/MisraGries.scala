package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed aggregator: at most `k`
  * counters per buffer, merged with the Agarwal et al. "Mergeable
  * Summaries" rule (combine counts, then subtract the (k+1)-th largest
  * count and drop non-positive).
  *
  * Guarantee: every key with true count > n/(k+1) is present in the
  * final summary (counts are underestimates; the SET is what matters).
  * The set may also contain keys below the threshold and depends on
  * partition/merge order — callers that need a deterministic exact
  * answer re-count the candidates and filter (see
  * HeavyHitters.exactAboveThreshold).
  *
  * Scale design: buffer size is O(k) regardless of key cardinality, so
  * the partial/final aggregation ships k counters per partition instead
  * of a full per-key map — the bounded-state path for heavy-hitter
  * detection over 100 TB of Zipfian keys.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
  require(k >= 1)

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], key: Long): Map[Long, Long] =
    buf.get(key) match {
      case Some(c) => buf.updated(key, c + 1)
      case None if buf.size < k => buf.updated(key, 1L)
      // full miss: decrement every counter (the classic MG step)
      case None =>
        buf.iterator.collect { case (x, c) if c > 1 => (x, c - 1) }.toMap
    }

  override def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] = {
    val combined = y.foldLeft(x) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.iterator.collect { case (key, c) if c > cut => (key, c - cut) }.toMap
    }
  }

  override def finish(r: Map[Long, Long]): Map[Long, Long] = r

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()

  override def outputEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
}
