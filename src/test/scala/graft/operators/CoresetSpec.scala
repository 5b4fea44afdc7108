package graft

import org.apache.spark.sql.functions._

import graft.operators.Coreset

/** Greedy k-center vs a brute-force driver-side replay, plus the
  * farthest-point invariants (non-increasing selection radii, distinct
  * picks, deterministic seed/tie rule). */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  private def l2sq(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  test("matches the brute-force greedy replay, including distances") {
    val k = 6
    val all = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    // reference: plain greedy farthest-point on the driver
    var selected = Vector(all.head)
    var expect = Vector((0L, all.head._1, 0.0))
    while (selected.length < k) {
      val (best, bd) = all.map { case (id, v) =>
        ((id, v), selected.map(s => l2sq(v, s._2)).min)
      }.reduceLeft { (a, b) =>
        if (b._2 > a._2 || (b._2 == a._2 && b._1._1 < a._1._1)) b else a
      }
      expect :+= ((selected.length.toLong, best._1, bd))
      selected :+= best
    }
    val got = Coreset.kCenterGreedy(emb, k)
      .as[(Long, Long, Double)].collect().toVector
    assert(got.map(r => (r._1, r._2)) == expect.map(e => (e._1, e._2)))
    // distances match to the output rounding
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 5e-5, s"rank ${g._1}: ${g._3} vs ${e._3}")
    }
  }

  test("selection radii are non-increasing after the seed") {
    val d = Coreset.kCenterGreedy(emb, 8)
      .orderBy($"sel_rank").select($"dist").as[Double].collect().drop(1)
    d.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) >= w(1), s"radius increased: ${w.toSeq}")
    }
    assert(d.forall(_ > 0.0), "all non-seed picks must be strictly novel points")
  }

  test("k=64 with checkpoint cadence 16 still equals the brute-force replay") {
    // verdict r7 item 7: the running-min form must stay exact at a k
    // where the old k-literal `least` tree would have planted 64×d
    // literals in one projection; cadence 16 forces three lineage cuts
    // mid-traversal, so the checkpoint path itself is exercised.
    val k = 64
    val all = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    var selected = Vector(all.head)
    var expect = Vector((0L, all.head._1))
    while (selected.length < k) {
      val best = all.map { case (id, v) =>
        ((id, v), selected.map(s => l2sq(v, s._2)).min)
      }.reduceLeft { (a, b) =>
        if (b._2 > a._2 || (b._2 == a._2 && b._1._1 < a._1._1)) b else a
      }
      expect :+= ((selected.length.toLong, best._1._1))
      selected :+= best._1
    }
    val got = Coreset.kCenterGreedy(emb, k, checkpointEvery = 16)
      .select($"sel_rank", $"vec_id").as[(Long, Long)].collect().toVector
    assert(got == expect)
  }

  test("k=1 returns just the seed") {
    val got = Coreset.kCenterGreedy(emb, 1).as[(Long, Long, Double)].collect()
    val minId = emb.agg(min($"vec_id")).head().getLong(0)
    assert(got.toSeq == Seq((0L, minId, 0.0)))
  }
}
