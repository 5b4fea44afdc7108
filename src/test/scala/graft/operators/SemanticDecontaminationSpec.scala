package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbeddingQuality

/** Semantic decontamination vs a driver-side exact replay: survivors
  * are exactly the rows whose max cosine to the eval slice is < tau,
  * and an eval member planted in the corpus always dies (self-sim 1). */
class SemanticDecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("survivor set matches the exact driver replay at tau=0.30") {
    val all = emb.select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val (ev, corpus) = all.partition(_._1 < 16)
    val expect = corpus
      .map { case (id, v) => (id, ev.map(e => cos(v, e._2)).max) }
      .filter(_._2 < 0.30).map(_._1).toSeq
    val got = EmbeddingQuality.decontaminateSemantic(
        emb.where($"vec_id" >= 16), emb.where($"vec_id" < 16), tau = 0.30)
      .select($"vec_id").as[Long].collect().toSeq
    assert(got == expect)
    assert(got.nonEmpty && got.size < corpus.length,
      "tau=0.30 must be non-degenerate on the fixture (removes some, keeps some)")
  }

  test("eval members planted in the corpus are always removed") {
    val got = EmbeddingQuality.decontaminateSemantic(
        emb, emb.where($"vec_id" < 16), tau = 0.999)
      .select($"vec_id").as[Long].collect().toSet
    assert((0L until 16L).forall(!got.contains(_)), "self-similarity 1 >= tau")
  }
}
