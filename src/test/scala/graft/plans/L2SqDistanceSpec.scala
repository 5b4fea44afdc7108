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

  test("codegen Sq4Distance is bit-identical to the HOF fold on real SQ4-packed data") {
    import graft.operators.SqIndex
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val (vmin, scale) = SqIndex.trainMinMax4(emb, 64)
    val codes = emb.select($"vec_id",
      SqIndex.encode4Expr($"embedding", vmin, scale).as("codes4"))
    val q = emb.where($"vec_id" < 4).select($"embedding".as("qvec"))
    val both = codes.crossJoin(q).select(
      SqIndex.sq4Dist($"qvec", $"codes4", 64, vmin, scale).as("gen"),
      SqIndex.sq4DistHof($"qvec", $"codes4", 64, vmin, scale).as("hof"))
    assert(both.where($"gen" =!= $"hof").count() == 0)
  }

  test("Sq4Distance odd-d: the final high nibble's phantom partner is never read") {
    import graft.operators.SqIndex
    // d = 3 packs as [c0·16+c1, c2·16+0]; the codegen loop must stop at
    // i = 2 (reading only the HIGH nibble of byte 1), identical to the HOF
    val vmin = Array(0.0, 0.0, 0.0)
    val scale = Array(1.0, 1.0, 1.0)
    val q = typedLit(Array(1f, 2f, 3f))
    val packed = typedLit(Array(18L, 48L)) // codes (1,2), (3,pad 0)
    val r = Seq(1).toDF("x").select(
      SqIndex.sq4Dist(q, packed, 3, vmin, scale).as("gen"),
      SqIndex.sq4DistHof(q, packed, 3, vmin, scale).as("hof")).head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
  }

  test("null and hand-computed values") {
    val r = Seq(1).toDF("x").select(
      Distances.l2SqFast(typedLit(Array(1f, 2f)), typedLit(Array(3f, 5f))).as("d"),
      Distances.dotFast(typedLit(Array(1f, 2f, 3f)), typedLit(Array(4f, 5f, 6f))).as("p")).head()
    assert(r.getDouble(0) == 13.0 && r.getDouble(1) == 32.0)
  }

  test("ragged inputs: fused forms are NULL, matching the HOF trees") {
    // HOF zip_with null-pads the shorter array and the sum absorbs the
    // null; the fused expressions must agree so FuseDistanceRule stays
    // value-preserving on arbitrary user SQL (not just fixed-dim tables).
    val a = typedLit(Array(1f, 2f, 3f))
    val b = typedLit(Array(4f, 5f))
    val r = Seq(1).toDF("x").select(
      Distances.l2Sq(a, b).as("l2_hof"),
      Distances.l2SqFast(a, b).as("l2_gen"),
      Distances.dot(a, b).as("dot_hof"),
      Distances.dotFast(a, b).as("dot_gen"),
      Distances.cosineSim(a, b).as("cos_hof"),
      Distances.cosineSimFast(a, b).as("cos_gen")).head()
    (0 until 6).foreach(i => assert(r.isNullAt(i), s"col $i should be NULL on ragged input"))
  }

  test("zero-norm input: fused CosineSim matches Divide zero-divisor semantics both ANSI modes") {
    val z = typedLit(Array(0f, 0f, 0f))
    val v = typedLit(Array(1f, 2f, 3f))
    // ANSI on (the Spark 4 session default): unfused tree throws
    // DIVIDE_BY_ZERO — the fused form must too, not produce NaN
    intercept[ArithmeticException] {
      Seq(1).toDF("x").select(Distances.cosineSim(z, v)).head()
    }
    intercept[ArithmeticException] {
      Seq(1).toDF("x").select(Distances.cosineSimFast(z, v)).head()
    }
    // ANSI off: both NULL
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val r = Seq(1).toDF("x").select(
        Distances.cosineSim(z, v).as("hof"),
        Distances.cosineSimFast(z, v).as("gen")).head()
      assert(r.isNullAt(0) && r.isNullAt(1))
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
    // healthy input unchanged either way
    val ok = Seq(1).toDF("x").select(
      Distances.cosineSim(v, v).as("hof_ok"),
      Distances.cosineSimFast(v, v).as("gen_ok")).head()
    assert(math.abs(ok.getDouble(0) - 1.0) < 1e-12 && ok.getDouble(0) == ok.getDouble(1))
  }

  test("interpreted (non-codegen) eval agrees with codegen on ragged and zero-norm") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def litF(a: Array[Float]) = Literal.create(a,
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))
    val dot = graft.plans.DotProduct(litF(Array(1f, 2f, 3f)), litF(Array(4f, 5f)))
    val l2 = graft.plans.L2SqDistance(litF(Array(1f, 2f, 3f)), litF(Array(4f, 5f)))
    val cosZ = graft.plans.CosineSim(litF(Array(0f, 0f)), litF(Array(1f, 2f)),
      failOnError = false)
    assert(dot.eval(null) == null && l2.eval(null) == null && cosZ.eval(null) == null)
    intercept[ArithmeticException] {
      graft.plans.CosineSim(litF(Array(0f, 0f)), litF(Array(1f, 2f)),
        failOnError = true).eval(null)
    }
  }
}
