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

  test("codegen AdcDistance is bit-identical to the HOF aggregate fold on real PQ data") {
    import graft.operators.PqIndex
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cb = PqIndex.seedCodebooks(emb, m = 8, subDim = 8, ksub = 16)
    val codes = PqIndex.encode(emb, cb, 8, 8)
    val luts = emb.where($"vec_id" < 4)
      .select($"vec_id".as("query_id"), PqIndex.lutExpr($"embedding", cb, 8, 8).as("lut"))
    val both = codes.crossJoin(luts).select(
      PqIndex.adcDist($"lut", $"codes", 8).as("gen"),
      PqIndex.adcDistHof($"lut", $"codes", 8).as("hof"))
    assert(both.where($"gen" =!= $"hof").count() == 0)
  }

  test("codegen SqDistance is bit-identical to the HOF fold on real SQ8 data") {
    import graft.operators.SqIndex
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val (vmin, scale) = SqIndex.trainMinMax(emb, 64)
    val codes = SqIndex.encode(emb, vmin, scale)
    val q = emb.where($"vec_id" < 4).select($"embedding".as("qvec"))
    val both = codes.crossJoin(q).select(
      SqIndex.sqDist($"qvec", $"codes", 64, vmin, scale).as("gen"),
      SqIndex.sqDistHof($"qvec", $"codes", 64, vmin, scale).as("hof"))
    assert(both.where($"gen" =!= $"hof").count() == 0)
  }

  test("null and hand-computed values") {
    val r = Seq(1).toDF("x").select(
      Distances.l2SqFast(typedLit(Array(1f, 2f)), typedLit(Array(3f, 5f))).as("d"),
      Distances.dotFast(typedLit(Array(1f, 2f, 3f)), typedLit(Array(4f, 5f, 6f))).as("p")).head()
    assert(r.getDouble(0) == 13.0 && r.getDouble(1) == 32.0)
  }
}
