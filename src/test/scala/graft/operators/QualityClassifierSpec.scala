package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hashed-linear classifier inference: weight-table determinism, score
  * bounds, threshold semantics, and a hand-replayed fixture score. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")

  test("syntheticWeights is deterministic, dense, and bounded in (-1, 1)") {
    val w1 = QualityClassifier.syntheticWeights(256)
    val w2 = QualityClassifier.syntheticWeights(256)
    assert(w1 === w2)
    assert(w1.size === 256 && w1.keySet === (0L until 256L).toSet)
    assert(w1.values.forall(v => v > -1.0 && v < 1.0))
    // not degenerate: both signs present
    assert(w1.values.exists(_ > 0) && w1.values.exists(_ < 0))
  }

  test("score emits one row per doc; mean logit is bounded; keep matches the threshold") {
    val w = QualityClassifier.syntheticWeights(256)
    val r = QualityClassifier.score(docs, w, b = 256).cache()
    assert(r.count() === docs.count())
    assert(r.where(abs($"score") >= 1.0).count() === 0,
      "a mean of (-1,1)-bounded weights must stay in (-1,1)")
    // keep is the sign rule on the UNROUNDED mean; at round-4 the rounded
    // score only disagrees with keep inside the +-5e-5 boundary band
    assert(r.where($"keep" && $"score" < -0.0001).count() === 0)
    assert(r.where(!$"keep" && $"score" > 0.0001).count() === 0)
    r.unpersist()
  }

  test("a two-word fixture scores exactly the hand-computed weight mean") {
    val w = QualityClassifier.syntheticWeights(256)
    def bucket(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(g.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 256L
    }
    def expected(grams: Seq[String]): Double = {
      val ws = grams.map(g => w(bucket(g))).sorted
      // HALF_UP — Spark's round() semantics for doubles
      BigDecimal(ws.foldLeft(0.0)(_ + _) / ws.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val fixture = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    // default wordNgrams=1: unigram bag
    val uni = QualityClassifier.score(fixture, w, b = 256).head()
    assert(uni.getLong(1) === 2L)
    assert(uni.getDouble(2) === expected(Seq("alpha", "beta")))
    // wordNgrams=2 adds the bigram
    val bi = QualityClassifier.score(fixture, w, b = 256, wordNgrams = 2).head()
    assert(bi.getLong(1) === 3L)
    assert(bi.getDouble(2) === expected(Seq("alpha", "beta", "alpha beta")))
  }

  test("a higher threshold keeps a subset of a lower threshold's survivors") {
    val w = QualityClassifier.syntheticWeights(256)
    val lo = QualityClassifier.score(docs, w, b = 256, threshold = -0.05)
      .where($"keep").select($"doc_id")
    val hi = QualityClassifier.score(docs, w, b = 256, threshold = 0.05)
      .where($"keep").select($"doc_id")
    assert(hi.exceptAll(lo).isEmpty)
    assert(hi.count() <= lo.count())
  }
}
