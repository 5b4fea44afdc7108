package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MetricsAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val ev = Seq(
    (1L, ts("2024-01-01 00:00:01"), 1L, "click", 10.0),
    (2L, ts("2024-01-01 00:01:00"), 1L, "click", 20.0),
    (3L, ts("2024-01-01 00:06:00"), 2L, "error", 30.0),
    (4L, ts("2024-01-01 00:07:00"), 2L, "click", 40.0))
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("counters") {
    val got = MetricsAnalytics.counters(ev).collect()
    val click = got.find(_.getString(0) == "click").get
    assert(click.getAs[Long]("n_events") == 3)
    assert(click.getAs[Double]("sum_value") == 70.0)
    assert(click.getAs[Long]("n_users") == 2)
  }

  test("percentiles: p50 of [10,20,40] is 20") {
    val got = MetricsAnalytics.percentiles(ev)
      .where($"event_type" === "click").head()
    assert(got.getAs[Double]("p50") == 20.0)
    assert(got.getAs[Double]("avg_value") == math.rint(70.0 / 3 * 1e4) / 1e4)
  }

  test("approx forms track the exact forms within tolerance on real events") {
    val events = readEvents(sf0001)
    val exact = MetricsAnalytics.percentiles(events).collect()
      .map(r => r.getString(0) -> r).toMap
    // the approx-quantile contract is RANK-space: the returned sample's
    // quantile position must be within the sketch's rank error — value-
    // space distance is unbounded on heavy tails (adjacent tail order
    // stats can sit 25% apart at this SF)
    val byType = events.select($"event_type", $"value").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    MetricsAnalytics.percentilesApprox(events).collect().foreach { a =>
      val vals = byType(a.getString(0))
      def rankOf(v: Double): Double = vals.count(_ <= v).toDouble / vals.length
      assert(rankOf(a.getAs[Double]("p50")) >= 0.48 && rankOf(a.getAs[Double]("p50")) <= 0.53)
      assert(rankOf(a.getAs[Double]("p95")) >= 0.93 && rankOf(a.getAs[Double]("p95")) <= 0.97)
      assert(rankOf(a.getAs[Double]("p99")) >= 0.975)
      assert(a.getAs[Double]("avg_value") == exact(a.getString(0)).getAs[Double]("avg_value"))
    }
    val exactUsers = MetricsAnalytics.counters(events).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    MetricsAnalytics.countersApprox(events).collect().foreach { a =>
      val e = exactUsers(a.getString(0))
      assert(math.abs(a.getAs[Long]("n_users") - e) <= math.max(0.15 * e, 2.0))
    }
  }

  test("hitRate") {
    val got = MetricsAnalytics.hitRate(ev, $"event_type" === "click").head()
    assert(got.getAs[Long]("total") == 4 && got.getAs[Long]("hits") == 3)
    assert(got.getAs[Double]("hit_rate") == 0.75)
  }

  test("rollingMean over last 2 rows (exact fixed-point)") {
    val got = MetricsAnalytics.rollingMean(ev, 2)
      .where($"event_type" === "click")
      .orderBy($"event_id").collect()
    val means = got.map(r =>
      r.getAs[Long]("rolling_sum_cents").toDouble / (100 * r.getAs[Long]("n_window")))
    assert(means.toSeq == Seq(10.0, 15.0, 30.0))
  }

  test("tumbling 5-minute windows split events correctly") {
    val got = MetricsAnalytics.tumbling(ev, "5 minutes").collect()
    // 00:00-00:05 has click×2; 00:05-00:10 has error and click
    assert(got.length == 3)
    val w0click = got.find(r => r.getAs[Long]("window_start") == 1704067200L).get
    assert(w0click.getAs[Long]("n_events") == 2)
  }
}
