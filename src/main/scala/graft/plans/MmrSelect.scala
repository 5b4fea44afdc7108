package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Greedy maximal-marginal-relevance selection over a bounded per-query
  * candidate list — the diversification step of a retrieval pipeline
  * (rerank the top-n of a k-NN stage so results are relevant AND mutually
  * dissimilar).
  *
  * Input: array<struct<vec_id: long, rel: double, vec: array<float>>> —
  * one query's candidates. Output: array<struct<rank: long, vec_id: long,
  * score: double>> of the `m` greedy picks, where pick t maximizes
  * `lam·rel(c) − (1−lam)·max_{s∈selected} cos(c, s)` (ties to the lowest
  * vec_id; the max-sim term is 0.0 when nothing is selected yet).
  *
  * Arithmetic is double-precision with left-to-right folds over the
  * vectors (same convention as [[L2SqDistance]]), so the unrolled DuckDB
  * oracle reproduces every score bit-exactly.
  *
  * Evaluation is interpreted ([[CodegenFallback]]) by design: this runs
  * AFTER the candidate-generation aggregation, on one row per query —
  * never on the corpus-sized hot path, so codegen would buy nothing.
  */
case class MmrSelect(child: Expression, lam: Double, m: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("rank", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _),
      StructField(_, DoubleType, _, _),
      StructField(_, ArrayType(FloatType, _), _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mmr_select expects array<struct<long, double, array<float>>>, got $other")
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val rels = new Array[Double](n)
    val vecs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0)
      rels(i) = row.getDouble(1)
      val v = row.getArray(2)
      val d = v.numElements()
      val vd = new Array[Double](d)
      var j = 0
      while (j < d) { vd(j) = v.getFloat(j).toDouble; j += 1 }
      vecs(i) = vd
      i += 1
    }
    val norms = vecs.map(v => math.sqrt(dot(v, v)))
    val taken = new Array[Boolean](n)
    // running max cosine similarity of each candidate to the selected set;
    // only meaningful once something IS selected (t >= 1) — the first pick
    // uses the 0.0 empty-set convention, and the first update overwrites
    // unconditionally (sims can be negative, so 0.0 is not a floor)
    val maxSim = new Array[Double](n)
    val out = new Array[AnyRef](math.min(m, n))
    var t = 0
    while (t < out.length) {
      var best = -1
      var bestScore = 0.0
      i = 0
      while (i < n) {
        if (!taken(i)) {
          val score = lam * rels(i) - (1.0 - lam) * maxSim(i)
          if (best < 0 || score > bestScore ||
              (score == bestScore && ids(i) < ids(best))) {
            best = i
            bestScore = score
          }
        }
        i += 1
      }
      taken(best) = true
      out(t) = InternalRow(t + 1L, ids(best), bestScore)
      i = 0
      while (i < n) {
        if (!taken(i)) {
          val sim = dot(vecs(i), vecs(best)) / (norms(i) * norms(best))
          if (t == 0 || sim > maxSim(i)) maxSim(i) = sim
        }
        i += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
