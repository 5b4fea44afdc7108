package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{CorpusOps => Ops}

class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("labelMetrics: metrics bounded in [0,1], perfect query scores 1.0, NDCG consistent") {
    val r = RetrievalEval.labelMetrics(emb, numQueries = 8, k = 10).cache()
    assert(r.count() == 8)
    assert(r.where($"precision" < 0 || $"precision" > 1 ||
      $"mrr" < 0 || $"mrr" > 1 || $"ndcg" < 0 || $"ndcg" > 1).count() == 0)
    // when every neighbor is relevant, all metrics are exactly 1
    assert(r.where($"n_rel" === 10)
      .where($"precision" =!= 1.0 || $"mrr" =!= 1.0 || $"ndcg" =!= 1.0)
      .count() == 0)
    // mrr = 1 iff the top-ranked hit is relevant — implies ndcg > 0
    assert(r.where($"mrr" === 1.0 && $"ndcg" === 0.0).count() == 0)
    r.unpersist()
  }

  test("labelMetrics hand-computed on a tiny fixture") {
    // 1 query (id 0, label 1), 4 candidates; ranks by distance:
    //   id 1 d=1 label 1 (rel), id 2 d=4 label 0, id 3 d=9 label 1 (rel)
    val rows = Seq(
      (0L, Array(0f, 0f), 1),
      (1L, Array(1f, 0f), 1),
      (2L, Array(2f, 0f), 0),
      (3L, Array(3f, 0f), 1)).toDF("vec_id", "embedding", "label")
    val r = RetrievalEval.labelMetrics(rows, numQueries = 1, k = 3).head()
    assert(r.getLong(1) == 2) // n_rel
    assert(math.abs(r.getDouble(2) - 0.6667) < 1e-9) // precision 2/3
    assert(r.getDouble(3) == 1.0) // first hit at rank 1
    // dcg = 1/log2(2) + 1/log2(4) = 1.5; idcg = 1/log2(2) + 1/log2(3)
    val expected = 1.5 / (1.0 + 1.0 / (math.log(3) / math.log(2)))
    assert(math.abs(r.getDouble(4) - math.rint(expected * 1e4) / 1e4) < 2e-4)
  }

  test("quantileBucket: deciles are ordered with value and roughly balanced") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val scored = docs.select($"doc_id",
      graft.functions.TextFunctions.qualityScoreFromStats(
        graft.functions.TextFunctions.textStats($"text")).as("quality"))
    val r = Ops.quantileBucket(scored, "quality", 10, exact = true).cache()
    assert(r.where($"bucket" < 0 || $"bucket" > 9).count() == 0)
    // bucket is monotone in value: max value of bucket b <= min of b+1
    val byB = r.groupBy($"bucket")
      .agg(min($"quality").as("lo"), max($"quality").as("hi"))
      .orderBy($"bucket").collect()
    byB.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(2) <= b.getDouble(1) + 1e-12)
      case _ =>
    }
    // deciles: no bucket holds more than 3x its fair share (quality ties
    // can imbalance, but not pathologically)
    val n = r.count()
    assert(r.groupBy($"bucket").count().where($"count" > n * 3 / 10).count() == 0)
    r.unpersist()
  }
}
