package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused dense matrix–vector product over an array<float> column:
  * y_i = Σ_j mat(i)(j)·x_j, accumulated in double ascending j, stored
  * back as float32 (the FAISS `VectorTransform.apply` storage
  * convention). The matrix rides in the expression by value — one
  * reference object shipped with the broadcast task binary, same pattern
  * as [[CentroidArgmin]]/[[PqEncode]] — so applying a learned rotation or
  * projection is a pure map-side projection: no join, no shuffle, O(1)
  * plan size in the matrix dimensions. */
case class MatVec(child: Expression, mat: Array[Array[Float]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"mat_vec expects array<float>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val rows = mat.length
    val out = new Array[Float](rows)
    var i = 0
    while (i < rows) {
      val row = mat(i)
      val lim = math.min(n, row.length)
      var s = 0.0
      var j = 0
      while (j < lim) {
        s += row(j).toDouble * v.getFloat(j).toDouble
        j += 1
      }
      out(i) = s.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
