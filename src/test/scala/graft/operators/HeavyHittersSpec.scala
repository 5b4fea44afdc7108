package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.MisraGriesAggregator

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exactAboveThreshold equals the exact groupBy answer on skewed data") {
    // Zipf-ish: key i appears ~ 2000/(i+1) times, 60 distinct keys
    val rows = (0 until 60).flatMap(i => Seq.fill(2000 / (i + 1))(i.toLong))
    val df = new scala.util.Random(3).shuffle(rows).toDF("key")
      .repartition(8) // candidates must survive multi-partition merge
    val k = 12
    val n = rows.size.toLong
    val thr = n / (k + 1)
    val expect = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > thr).toMap
    val got = HeavyHitters.exactAboveThreshold(df, "key", k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("MG summary retains every key above n/(k+1) across random merges") {
    val rnd = new scala.util.Random(17)
    (0 until 5).foreach { trial =>
      val keys = (0 until 3000).map(_ => math.abs(rnd.nextGaussian() * 10).toLong)
      val k = 8
      val thr = keys.size / (k + 1)
      val mustKeep = keys.groupBy(identity).filter(_._2.size > thr).keySet
      // fold through reduce in random partition chunks, then merge
      val agg = new MisraGriesAggregator(k)
      val parts = keys.grouped(500).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
      val merged = parts.foldLeft(agg.zero)(agg.merge)
      assert(mustKeep.subsetOf(merged.keySet),
        s"trial $trial lost ${mustKeep -- merged.keySet}")
      assert(merged.size <= k)
    }
  }

  test("exactAboveThreshold handles an empty input") {
    val df = Seq.empty[Long].toDF("key")
    assert(HeavyHitters.exactAboveThreshold(df, "key", 5).count() == 0)
  }
}
