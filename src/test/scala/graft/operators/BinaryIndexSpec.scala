package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BinaryIndexSpec extends SparkSpec {
  import spark.implicits._

  test("encode packs sign bits little-endian within 32-bit words") {
    // dims 1..32 → word 0; dims 33..64 → word 1
    val v = Array.fill(64)(-1f)
    v(0) = 1f   // bit 0 of word 0
    v(5) = 2f   // bit 5 of word 0
    v(32) = 3f  // bit 0 of word 1
    v(63) = 4f  // bit 31 of word 1
    val got = Seq(Tuple1(v)).toDF("embedding")
      .select(BinaryIndex.encode($"embedding", 64).as("code"))
      .head().getSeq[Long](0)
    assert(got == Seq((1L << 0) | (1L << 5), (1L << 0) | (1L << 31)))
  }

  test("hamming equals popcount of xor") {
    val got = Seq((Array(0x0FL, 0L), Array(0xF0L, 1L))).toDF("a", "b")
      .select(BinaryIndex.hamming($"a", $"b").as("h")).head().getLong(0)
    assert(got == 8 + 1)
  }

  test("selfSearch: k rows per query, no self-match, hamming non-decreasing in rank") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val got = BinaryIndex.selfSearch(emb, d = 64, numQueries = 4, k = 10).collect()
    assert(got.length == 40)
    assert(!got.exists(r => r.getAs[Long]("query_id") == r.getAs[Long]("vec_id")))
    got.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val hs = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("hamming"))
      assert(hs.zip(hs.tail).forall { case (a, b) => a <= b })
    }
  }

  test("rotated-sign shortlist + exact re-rank: recall rises with shortlist size") {
    // a 64-bit sign sketch is the coarsest tier — on isotropic data the
    // shortlist size is the recall knob (the sketch only prunes; the
    // exact re-rank decides). Measure the curve and gate the knob's
    // monotone effect + a floor at a 20%-corpus shortlist.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val exact = KnnSearch.selfTopK(emb, numQueries = 8, k = 10)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rmat = Rotation.randomOrthogonal(64, 42L)
    val rotated = emb.select($"vec_id",
      Rotation.rotateExpr($"embedding", rmat).as("embedding"))
    val curve = Seq(30, 60, 100).map { sl =>
      val reranked = BinaryIndex.selfSearchReranked(emb, d = 64, numQueries = 8,
        k = 10, shortlist = sl, signSource = Some(rotated))
        .select($"query_id", $"vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (reranked intersect exact).size.toDouble / exact.size
      info(f"shortlist $sl%3d → recall@10 = $recall%.3f")
      recall
    }
    assert(curve.zip(curve.tail).forall { case (a, b) => b >= a },
      "growing the shortlist must never lose recall")
    assert(curve.last >= 0.6, s"20%-corpus shortlist floor, got ${curve.last}")
  }
}
