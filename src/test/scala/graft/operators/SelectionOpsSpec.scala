package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sorted-neighborhood blocking, decayed counters, and the 2-D skyline —
  * hand-derivable fixtures plus brute-force replays. */
class SelectionOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sortedNeighborhoodPairs finds identical docs and respects the n*(w-1) bound") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // identical → same key, adjacent
      (3L, "completely different words in this entry here now"),
      (4L, "another unrelated set of tokens lives right here"),
      (5L, "the quick brown fox jumps over the lazy cat")
    ).toDF("doc_id", "text")
    val pairs = Dedup.sortedNeighborhoodPairs(docs, window = 3, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0L },
      "identical docs sort adjacent and must pair at hamming 0")
    assert(pairs.length <= 5 * 2, "candidate volume is bounded by n*(w-1)")
  }

  test("sortedNeighborhood pairs are a subset of the all-pairs hamming gate") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(100)
    val sim = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    val got = Dedup.sortedNeighborhoodPairs(docs, window = 6, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, h) =>
      assert(ham(sim(a), sim(b)) == h && h <= 8,
        s"pair ($a,$b) must carry its true hamming within the gate")
    }
  }

  test("decayedCounts: hand-derived half-life arithmetic") {
    val events = Seq(
      ("click", "2024-01-01 01:00:00"),  // the reference instant (max ts)
      ("click", "2024-01-01 00:00:00"),  // exactly one half-life earlier
      ("view", "2024-01-01 01:00:00")
    ).toDF("event_type", "raw")
      .select($"event_type", to_timestamp($"raw").as("ts"))
    val got = MetricsAnalytics.decayedCounts(events, halfLifeSeconds = 3600.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("click")._1 == 2L && got("view")._1 == 1L)
    assert(math.abs(got("click")._2 - 1.5) < 1e-9, s"1 + 2^-1 = 1.5, got ${got("click")._2}")
    assert(got("view")._2 == 1.0)
  }

  test("decayedCounts: hot-key fixture — bounded per-bucket buffers, exact vs driver fold") {
    // one key, 10⁵ events spread over ~28 hours: the pre-r8 shape collected
    // ALL of them into one per-key sorted list (the O(events-per-key)
    // buffer the verdict flagged); the two-level fold caps each
    // aggregation buffer at events-per-(key,bucket) and this fixture
    // spans >1 bucket, so the partials plane is exercised for real.
    val n = 100000
    val baseUs = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    val stepUs = 1000000L // 1 s apart → 100k s ≈ 28 h ≈ 28 hourly buckets
    val events = spark.range(n.toLong)
      .select(lit("hot").as("event_type"),
        timestamp_micros(lit(baseUs) + $"id" * stepUs).as("ts"))
    val got = MetricsAnalytics.decayedCounts(events, halfLifeSeconds = 3600.0)
      .collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == n.toLong)
    // driver replay of the SAME two-level fold (hourly buckets, ts order)
    val lambda = math.log(2.0) / 3600.0
    val refUs = baseUs + (n - 1).toLong * stepUs
    val partials = (0 until n)
      .map { i =>
        val us = baseUs + i.toLong * stepUs
        (us / 3600000000L, math.exp(-lambda * ((refUs - us).toDouble / 1e6)))
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (bkt, xs) => xs.foldLeft(0.0)(_ + _._2) }
    val expect = BigDecimal(partials.foldLeft(0.0)(_ + _))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0).getDouble(2) == expect,
      s"two-level fold parity: got ${got(0).getDouble(2)} expect $expect")
  }

  test("skyline2D equals the brute-force dominance replay") {
    val pts = Seq(
      (1L, 10L, 0.5), (2L, 20L, 0.4), (3L, 20L, 0.6), (4L, 5L, 0.9),
      (5L, 20L, 0.6), // duplicate of 3 — both non-dominated
      (6L, 15L, 0.6), // dominated by 3 (x smaller, y equal)
      (7L, 25L, 0.1)
    ).toDF("doc_id", "x", "y")
    val got = CorpusOps.skyline2D(pts, "x", "y")
      .select($"doc_id").as[Long].collect().toSet
    // brute replay
    val all = Seq((1L, 10L, 0.5), (2L, 20L, 0.4), (3L, 20L, 0.6), (4L, 5L, 0.9),
      (5L, 20L, 0.6), (6L, 15L, 0.6), (7L, 25L, 0.1))
    val expect = all.filter { case (_, x, y) =>
      !all.exists { case (_, ox, oy) =>
        ox >= x && oy >= y && (ox > x || oy > y)
      }
    }.map(_._1).toSet
    assert(got == expect, s"got $got expect $expect")
    assert(got == Set(3L, 4L, 5L, 7L))
  }

  test("skyline2D: continuous-x plane — brute-force parity, no unpartitioned window") {
    // continuous x ⇒ the distinct-x value plane is corpus-sized; the
    // pre-r8 shape ran one unpartitioned Window over it (single task).
    // The fixture proves both the result AND the plan: every window the
    // frontier pass plans is partitioned (the cross-partition prefix
    // lives in a driver fold over ≤ numPartitions values instead).
    val n = 3000
    val rnd = new scala.util.Random(7)
    val pts = (1 to n).map(i => (i.toLong, rnd.nextDouble(), rnd.nextDouble()))
    val got = CorpusOps.skyline2D(pts.toDF("doc_id", "x", "y"), "x", "y")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = got.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "the frontier pass still uses a (partitioned) window")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "no unpartitioned window over the value plane on continuous x")
    val gotSet = got.select($"doc_id").as[Long].collect().toSet
    val expect = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, ox, oy) => ox >= x && oy >= y && (ox > x || oy > y) }
    }.map(_._1).toSet
    assert(gotSet == expect, s"skyline mismatch: extra=${gotSet -- expect} missing=${expect -- gotSet}")
  }
}
