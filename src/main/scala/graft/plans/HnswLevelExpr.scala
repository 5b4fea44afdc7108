package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** HNSW node level as a column: the deterministic geometric level
  * `min(floor(-ln(U(splitmix64(id))) / ln(m)), 24)` every graph build uses
  * ([[graft.operators.HnswIndex.levelOf]] — ONE shared definition). Exists
  * for the q_hnsw_levels structural fingerprint: the level layout of the
  * corpus is dumped as a histogram and hash-matched against a DuckDB
  * oracle that reproduces splitmix64 in HUGEINT-mod-2⁶⁴ SQL — pinning the
  * function that shapes q_hnsw_knn/q_hnsw_persisted graphs with an exact
  * compare instead of only a recall gate. Control-plane/diagnostic usage,
  * so interpreted eval (CodegenFallback) is fine — same trade as
  * [[CentroidArgmin]].
  */
case class HnswLevel(child: Expression, m: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hnsw_level expects bigint, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    graft.operators.HnswIndex.levelOf(input.asInstanceOf[Long], m)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
