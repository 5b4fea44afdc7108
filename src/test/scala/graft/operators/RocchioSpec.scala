package graft

import org.apache.spark.sql.functions._

import graft.operators.{KnnSearch, Rocchio}

class RocchioSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("alpha=1, beta=0 degenerates to the plain FLAT search") {
    val flat = KnnSearch.selfTopK(emb, numQueries = 4, k = 10)
      .select($"query_id", $"rank", $"vec_id").collect().map(_.toSeq).toSeq
    val prf = Rocchio.selfSearch(emb, numQueries = 4, feedback = 5, k = 10,
        alpha = 1.0, beta = 0.0)
      .select($"query_id", $"rank", $"vec_id").collect().map(_.toSeq).toSeq
    assert(prf == flat)
  }

  test("matches a driver-side replay of the two-round PRF") {
    val all = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1).toMap
    def l2sq(a: Array[Double], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    val expect = (0L until 4L).flatMap { qid =>
      val qv = all(qid).map(_.toDouble)
      val top5 = all.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, l2sq(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.take(5)
      // feedback fold in rank order
      val fsum = new Array[Double](qv.length)
      top5.foreach { case (id, _) =>
        val v = all(id); var i = 0
        while (i < v.length) { fsum(i) += v(i).toDouble; i += 1 }
      }
      val nq = qv.indices.map(i => 0.5 * qv(i) + 0.5 * (fsum(i) / 5.0)).toArray
      all.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, l2sq(nq, v)) }
        .sortBy { case (id, d) => (d, id) }.take(10).zipWithIndex
        .map { case ((id, _), r) => (qid, r + 1L, id) }
    }
    val got = Rocchio.selfSearch(emb, numQueries = 4, feedback = 5, k = 10)
      .select($"query_id", $"rank", $"vec_id").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got == expect)
  }

  test("feedback actually moves the ranking on at least one query") {
    val flat = KnnSearch.selfTopK(emb, numQueries = 8, k = 10)
      .select($"query_id", $"rank", $"vec_id").collect().map(_.toSeq).toSet
    val prf = Rocchio.selfSearch(emb, numQueries = 8, feedback = 5, k = 10)
      .select($"query_id", $"rank", $"vec_id").collect().map(_.toSeq).toSet
    assert(flat != prf, "PRF with beta=0.5 should change some ranking")
  }
}
