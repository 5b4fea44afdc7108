package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DistancesSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Float*) = typedLit(xs.toArray)

  test("l2Sq matches hand-computed squared euclidean") {
    val d = Seq(1).toDF("x")
      .select(Distances.l2Sq(vec(1f, 2f), vec(3f, 5f)).as("d"))
      .head().getDouble(0)
    assert(d == 13.0) // (1-3)^2 + (2-5)^2
  }

  test("l2Sq of identical vectors is zero; symmetry holds") {
    val row = Seq(1).toDF("x").select(
      Distances.l2Sq(vec(0.5f, -2f, 3f), vec(0.5f, -2f, 3f)).as("self"),
      Distances.l2Sq(vec(1f, 2f), vec(4f, 6f)).as("ab"),
      Distances.l2Sq(vec(4f, 6f), vec(1f, 2f)).as("ba")).head()
    assert(row.getDouble(0) == 0.0)
    assert(row.getDouble(1) == row.getDouble(2))
  }

  test("dot / norm / cosine") {
    val row = Seq(1).toDF("x").select(
      Distances.dot(vec(1f, 2f, 3f), vec(4f, 5f, 6f)).as("dot"),
      Distances.norm2(vec(3f, 4f)).as("norm"),
      Distances.cosineSim(vec(1f, 0f), vec(0f, 1f)).as("ortho"),
      Distances.cosineSim(vec(2f, 0f), vec(5f, 0f)).as("par")).head()
    assert(row.getDouble(0) == 32.0)
    assert(row.getDouble(1) == 5.0)
    assert(row.getDouble(2) == 0.0)
    assert(math.abs(row.getDouble(3) - 1.0) < 1e-12)
  }

  test("cosineSimFast (one-pass fused) is bit-identical to cosineSim on real vectors") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(60)
    val both = emb.as("a").join(emb.as("b"),
        org.apache.spark.sql.functions.col("a.vec_id") <
          org.apache.spark.sql.functions.col("b.vec_id"))
      .select(
        Distances.cosineSim(
          org.apache.spark.sql.functions.col("a.embedding"),
          org.apache.spark.sql.functions.col("b.embedding")).as("hof"),
        Distances.cosineSimFast(
          org.apache.spark.sql.functions.col("a.embedding"),
          org.apache.spark.sql.functions.col("b.embedding")).as("fused"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("elementSum and hasDim") {
    val row = Seq(1).toDF("x").select(
      Distances.elementSum(vec(1.5f, 2.5f, -1f)).as("s"),
      Distances.hasDim(vec(1f, 2f), 2).as("ok"),
      Distances.hasDim(vec(1f, 2f), 3).as("bad")).head()
    assert(row.getDouble(0) == 3.0)
    assert(row.getBoolean(1) && !row.getBoolean(2))
  }
}
