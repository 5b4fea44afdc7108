package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator (SURVEY §2.10): keeps the k smallest
  * (dist, vec_id) pairs — the typed-UDAF alternative to the
  * `row_number() <= k` window for per-query top-k. Partial buffers are
  * size-bounded (≤ k), so map-side combine ships k rows per partition per
  * key instead of all candidates — the same partial/final shape as the
  * reference's shard merge (vector_search_cluster.py:300-359).
  *
  * Total order (dist, vec_id) matches the window path exactly, so results
  * are interchangeable.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: Seq[(Double, Long)] = Vector.empty

  private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sorted.take(k)

  override def reduce(buf: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size < k || implicitly[Ordering[(Double, Long)]].lt(a, buf.last)) trim(buf :+ a)
    else buf

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(x ++ y)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(r)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
