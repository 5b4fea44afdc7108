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
