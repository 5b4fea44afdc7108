package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused text expressions for the dedup hot paths. Each is value-identical
  * to a pure-SQL formulation (kept in the DuckDB oracles), but evaluates in
  * one pass instead of per-element interpreted lambdas. CodegenFallback is
  * fine here: the md5 / hash-set work dominates, not eval dispatch. */
object TextExpressions {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private[plans] def md5Bytes(s: UTF8String): Array[Byte] = {
    val d = digest.get()
    d.reset()
    d.digest(s.getBytes)
  }
}

/** 64-bit weighted SimHash over a token array, emitted as a 64-char
  * bitstring. Value-identical to the HOF form (Dedup.simhashExprHof /
  * the q_simhash DuckDB oracle): bit j draws on hex digit j/4 (first 16
  * hex chars = first 8 md5 bytes, high nibble first), bit j%4 within the
  * digit; each token occurrence votes ±1; bit = 1 iff the vote is
  * positive. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      val md5 = TextExpressions.md5Bytes(tokens.getUTF8String(t))
      var j = 0
      while (j < 64) {
        val byte = md5(j / 8) & 0xff
        // hex char index j/4: even chars are high nibbles
        val d = if ((j / 4) % 2 == 0) byte >>> 4 else byte & 0xf
        votes(j) += (((d >>> (j % 4)) & 1) << 1) - 1
        j += 1
      }
      t += 1
    }
    val bits = new Array[Byte](64)
    var j = 0
    while (j < 64) {
      bits(j) = if (votes(j) > 0) '1' else '0'
      j += 1
    }
    UTF8String.fromBytes(bits)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Set-Jaccard similarity of two string arrays in one pass:
  * |A∩B| / |A∪B| with distinct-element semantics — value-identical to
  * size(array_intersect)/size(array_union) but builds one hash set and
  * never materializes the intersection/union arrays. */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"jaccard expects (array<string>, array<string>), got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[UTF8String](x.numElements() * 2)
    var i = 0
    while (i < x.numElements()) { setA.add(x.getUTF8String(i)); i += 1 }
    val seenB = new java.util.HashSet[UTF8String](y.numElements() * 2)
    var inter = 0
    i = 0
    while (i < y.numElements()) {
      val e = y.getUTF8String(i)
      if (seenB.add(e) && setA.contains(e)) inter += 1
      i += 1
    }
    val union = setA.size() + seenB.size() - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Hamming distance between two equal-length strings in one pass —
  * value-identical to the per-position substr comparison fold. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"hamming expects (string, string), got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var d = 0
    var i = 0
    while (i < n) { if (x(i) != y(i)) d += 1; i += 1 }
    d
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
