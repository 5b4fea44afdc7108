package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SqIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("codes are in [0,255] and constant dimensions encode as 0") {
    val vecs = Seq(
      (0L, Array(0.0f, 1.0f, 5.0f)),
      (1L, Array(10.0f, 1.0f, -5.0f)),
      (2L, Array(5.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val (vmin, scale) = SqIndex.trainMinMax(vecs, 3)
    assert(vmin.toSeq == Seq(0.0, 1.0, -5.0))
    assert(scale(1) == 0.0) // dim 1 constant
    val codes = SqIndex.encode(vecs, vmin, scale)
      .orderBy($"vec_id").select($"codes").collect()
      .map(_.getSeq[Long](0))
    assert(codes.forall(_.forall(c => c >= 0 && c <= 255)))
    assert(codes.forall(_.apply(1) == 0L)) // constant dim → code 0
    assert(codes(0).head == 0L && codes(1).head == 255L) // min → 0, max → 255
  }

  test("reconstruction error per dimension is bounded by scale/2 + rounding") {
    val (vmin, scale) = SqIndex.trainMinMax(emb, 64)
    val decoded = SqIndex.encode(emb, vmin, scale)
      .select($"vec_id", $"embedding", $"codes").collect()
    decoded.foreach { r =>
      val v = r.getSeq[Float](1)
      val c = r.getSeq[Long](2)
      (0 until 64).foreach { i =>
        val recon = vmin(i) + c(i) * scale(i)
        assert(math.abs(v(i) - recon) <= scale(i) / 2 + 1e-9,
          s"vec ${r.getLong(0)} dim $i")
      }
    }
  }

  test("SQ4 packed codes round-trip: unpack(pack(c)) == c, codes in [0,15]") {
    val (vmin, scale) = SqIndex.trainMinMax4(emb, 64)
    val rows = emb
      .select($"vec_id", $"embedding",
        SqIndex.encode4Expr($"embedding", vmin, scale).as("codes4"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val packed = r.getSeq[Long](2)
      assert(packed.length == 32)
      assert(packed.forall(b => b >= 0 && b <= 255))
      (0 until 64).foreach { i =>
        val b = packed(i / 2)
        val code = if (i % 2 == 0) b >> 4 else b & 15L
        assert(code >= 0 && code <= 15)
        // quantization bound with the coarser 4-bit grid
        val recon = vmin(i) + code * scale(i)
        assert(math.abs(v(i) - recon) <= scale(i) / 2 + 1e-9,
          s"vec ${r.getLong(0)} dim $i")
      }
    }
  }

  test("SQ4 search recall@10 vs exact FLAT degrades gracefully at 8x compression") {
    val exact = KnnSearch.selfTopK(emb, numQueries = 8, k = 10)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq4 = SqIndex.selfSearch4(emb, numQueries = 8, d = 64, k = 10)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect sq4).size.toDouble / exact.size
    assert(recall >= 0.6, s"SQ4 recall $recall") // coarser grid, lower bar than SQ8
  }

  test("SQ8 search recall@10 vs exact FLAT is near-perfect at 4x compression") {
    val exact = KnnSearch.selfTopK(emb, numQueries = 8, k = 10)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = SqIndex.selfSearch(emb, numQueries = 8, d = 64, k = 10)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect sq).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }
}
