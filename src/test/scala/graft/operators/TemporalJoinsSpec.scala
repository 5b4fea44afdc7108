package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin picks the latest ref at or before each probe") {
    val probes = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "probe_id")
      .withColumn("t", timestamp_micros($"t" * 1000000L))
    val refs = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (2L, 7L, 3.0))
      .toDF("k", "t", "v")
      .withColumn("t", timestamp_micros($"t" * 1000000L))
    val got = TemporalJoins.asofJoin(probes, refs, "k", "t", Seq("v"))
      .select($"probe_id", $"asof_v")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(100L) == Some(1.0)) // equal time is inclusive
    assert(got(101L) == Some(2.0)) // latest prior, not first
    assert(got(102L) == None)      // no ref at or before t=5
  }

  test("asofJoin matches a naive per-probe max-prior-ref scan on random data") {
    val rnd = new scala.util.Random(7)
    val probes = (0 until 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val refs = (0 until 200).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toDouble))
      // unique (k, t): asofJoin's documented precondition
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val pDf = probes.toDF("k", "t", "probe_id")
      .withColumn("t", timestamp_micros($"t" * 1000L))
    val rDf = refs.toDF("k", "t", "v")
      .withColumn("t", timestamp_micros($"t" * 1000L))
    val got = TemporalJoins.asofJoin(pDf, rDf, "k", "t", Seq("v"))
      .select($"probe_id", $"asof_v")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    probes.foreach { case (k, t, id) =>
      val expect = refs.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(id) == expect, s"probe $id key=$k t=$t")
    }
  }

  test("latestPerKeyTime keeps the max-tiebreak row per (key, time)") {
    val refs = Seq((1L, 10L, 5L, 1.0), (1L, 10L, 9L, 2.0), (1L, 20L, 1L, 3.0))
      .toDF("k", "t", "event_id", "v")
    val got = TemporalJoins.latestPerKeyTime(refs, "k", "t", "event_id")
      .orderBy($"t").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Double]("v") == 2.0)
  }

  test("intervalJoinBinned equals a naive range join on random data") {
    val rnd = new scala.util.Random(11)
    val lenSec = 30L
    val events = (0 until 500).map(i =>
      (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(3600).toLong))
    val anchors = (0 until 80).map(i =>
      (1000L + i, rnd.nextInt(4).toLong, rnd.nextInt(3600).toLong))
    val eDf = events.toDF("event_id", "k", "sec")
      .withColumn("ts", timestamp_micros($"sec" * 1000000L)).drop("sec")
    val aDf = anchors.toDF("aid", "k", "sec")
      .withColumn("ts", timestamp_micros($"sec" * 1000000L)).drop("sec")
    val got = TemporalJoins.intervalJoinBinned(eDf, aDf, "k", "ts", "aid", lenSec)
      .select($"_anchor_id", $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (for {
      (aid, ak, asec) <- anchors
      (eid, ek, esec) <- events
      if ek == ak && esec >= asec && esec < asec + lenSec
    } yield (aid, eid)).toSet
    assert(got == expect)
  }

  test("intervalJoinBinned covers windows that straddle a bin boundary") {
    // anchor at t=59 with len=30 spans bins [1, 2]; event at t=70 is in
    // bin 2 and contained — missed by any single-bin join
    val eDf = Seq((1L, 1L, 70L)).toDF("event_id", "k", "sec")
      .withColumn("ts", timestamp_micros($"sec" * 1000000L)).drop("sec")
    val aDf = Seq((10L, 1L, 59L)).toDF("aid", "k", "sec")
      .withColumn("ts", timestamp_micros($"sec" * 1000000L)).drop("sec")
    val got = TemporalJoins.intervalJoinBinned(eDf, aDf, "k", "ts", "aid", 30L)
      .select($"_anchor_id", $"event_id").collect()
    assert(got.length == 1 && got(0).getLong(0) == 10L)
  }
}
