package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Distances

class L2SqDistanceSpec extends SparkSpec {
  import spark.implicits._

  test("codegen l2SqFast is bit-identical to the HOF l2Sq on real vectors") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(100)
    val q = emb.where($"vec_id" === 0).select($"embedding".as("qvec"))
    val both = emb.crossJoin(q).select(
      Distances.l2Sq($"qvec", $"embedding").as("hof"),
      Distances.l2SqFast($"qvec", $"embedding").as("gen"))
    assert(both.where($"hof" =!= $"gen").count() == 0)
  }

  test("codegen dotFast is bit-identical to the HOF dot") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(100)
    val q = emb.where($"vec_id" === 1).select($"embedding".as("qvec"))
    val both = emb.crossJoin(q).select(
      Distances.dot($"qvec", $"embedding").as("hof"),
      Distances.dotFast($"qvec", $"embedding").as("gen"))
    assert(both.where($"hof" =!= $"gen").count() == 0)
  }

  test("null and hand-computed values") {
    val r = Seq(1).toDF("x").select(
      Distances.l2SqFast(typedLit(Array(1f, 2f)), typedLit(Array(3f, 5f))).as("d"),
      Distances.dotFast(typedLit(Array(1f, 2f, 3f)), typedLit(Array(4f, 5f, 6f))).as("p")).head()
    assert(r.getDouble(0) == 13.0 && r.getDouble(1) == 32.0)
  }
}
