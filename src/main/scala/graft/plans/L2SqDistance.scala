package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused codegen squared-L2 distance over two array<float> columns — the
  * performance form of Distances.l2Sq (SURVEY §4 "custom Catalyst work"):
  * the higher-order-function chain allocates a zipped array and evaluates
  * a lambda per element; this compiles to a single primitive loop inside
  * whole-stage codegen.
  *
  * Numerics are IDENTICAL to the HOF form (per-element double cast,
  * left-to-right accumulation), so swapping it in cannot change any
  * oracle-checked result. Mismatched-length inputs yield NULL, exactly
  * like the HOF tree (zip_with null-pads the shorter side and the sum
  * absorbs the null) — FuseDistanceRule rewrites arbitrary user SQL, so
  * the fused form must preserve ragged-input semantics too. Likewise a
  * NULL *element* in either array yields NULL (the HOF lambda maps it to
  * a null product and the sum absorbs it); the codegen emits the
  * per-element null branch only when the input schema says elements may
  * be null (`containsNull`), so non-nullable hot paths keep the tight
  * three-op loop.
  */
case class L2SqDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"l2_sq expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  private def mayHaveNullElements: Boolean =
    Seq(left.dataType, right.dataType).exists {
      case ArrayType(_, cn) => cn
      case _ => false
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val nullCheck = if (mayHaveNullElements)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused codegen PQ asymmetric-distance (ADC): sum over subspaces s of
  * lut(s)(codes(s)) — value-identical to the HOF fold
  * `aggregate(sequence(0, m-1), 0.0D, (acc, s) => acc +
  * lut[s+1][codes[s+1]+1])` (same ascending-s double addition order; the
  * q_pq_adc_knn / q_ivfpq_knn oracles reproduce it in SQL). This is the
  * innermost loop of PQ search — a single primitive loop per candidate
  * row inside whole-stage codegen instead of an interpreted per-subspace
  * fold over a materialized sequence. */
case class AdcDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"adc_distance expects (array<array<double>>, array<long>), got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += lut.getArray(s).getDouble(codes.getLong(s).toInt)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0;
         |int $m = $b.numElements();
         |for (int $s = 0; $s < $m; $s++) {
         |  $acc += $a.getArray($s).getDouble((int) $b.getLong($s));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused nearest-centroid argmin: the cid of the centroid minimizing
  * squared-L2 to the vector, ties to the lowest cid — value-identical to
  * `array_min(transform(centroids, struct(l2SqFast(vec, cvec), cid)))
  * .getField("cid")` (IvfIndex's HOF assignment, parity-tested). The
  * centroid matrix rides in the expression by value: one reference
  * object, O(1) codegen size at any nlist, shipped once per stage with
  * the broadcast task binary. This is THE corpus-side IVF build loop
  * (n × nlist × d flops) — one primitive Java loop per row. */
case class CentroidArgmin(
    child: Expression,
    cids: Array[Long],
    cents: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"centroid_argmin expects array<float>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var bestCid = Long.MaxValue
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val lim = math.min(n, cent.length)
      var d = 0.0
      var j = 0
      while (j < lim) {
        val diff = v.getFloat(j).toDouble - cent(j).toDouble
        d += diff * diff
        j += 1
      }
      if (d < bestD || (d == bestD && cids(c) < bestCid)) { bestD = d; bestCid = cids(c) }
      c += 1
    }
    bestCid
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused PQ encoder: per subspace s, argmin over that subspace's codebook
  * of the squared-L2 between the s-th `subDim`-slice of the vector and
  * the code centroid (ties to the lowest code). Codebooks ride in the
  * expression by value — one reference object, shipped with the
  * broadcast task binary, O(1) codegen size at any m×ksub.
  * Value-identical to the HOF form (PqIndex.encodeExprHof — per-subspace
  * `array_min(transform(codebook, struct(l2SqFast(slice(vec)), code)))`,
  * parity-tested): same double-precision left-to-right accumulation, same
  * short-vector truncation semantics as slice + min-length L2. This is
  * the corpus-side build loop of PQ — m×ksub×subDim flops per row — so
  * it runs as one primitive Java loop instead of nested interpreted
  * lambdas over literal arrays. */
case class PqEncode(
    child: Expression,
    codebooks: Array[Array[Array[Float]]],
    subDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_encode expects array<float>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val m = codebooks.length
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      val sub = codebooks(s)
      val base = s * subDim
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < sub.length) {
        val cent = sub(c)
        // slice semantics: elements past the vector end just don't exist;
        // L2 runs over min(available, subDim, centroid length)
        val lim = math.min(math.min(subDim, n - base), cent.length)
        var d = 0.0
        var j = 0
        while (j < lim) {
          val diff = v.getFloat(base + j).toDouble - cent(j).toDouble
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toLong
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused codegen inner product. Mismatched-length inputs yield NULL —
  * the exact semantics of the `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * HOF tree it replaces (zip_with null-pads the shorter side, and the sum
  * absorbs the null), so the FuseDistanceRule rewrite is value- AND
  * nullability-preserving on arbitrary user SQL, ragged arrays included.
  * A NULL element likewise yields NULL (null product, absorbed by the
  * sum); the per-element branch is emitted only for `containsNull`
  * schemas. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"dot expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  private def mayHaveNullElements: Boolean =
    Seq(left.dataType, right.dataType).exists {
      case ArrayType(_, cn) => cn
      case _ => false
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val nullCheck = if (mayHaveNullElements)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused codegen cosine similarity: dot, ‖a‖² and ‖b‖² accumulated in ONE
  * primitive loop, result = dot / (√‖a‖²·√‖b‖²). Bit-identical to the
  * three-pass `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` form
  * (Distances.cosineSim / cosineSimFast): each of the three sums uses the
  * same left-to-right double accumulation, and the final combine is the
  * same expression — parity spec-gated, so swapping it in cannot change
  * the q_cosine_knn-family oracle results.
  *
  * Edge parity with the unfused tree (FuseDistanceRule rewrites arbitrary
  * user SQL, so these must match exactly):
  *  - mismatched lengths → NULL (the HOF dot null-pads; [[DotProduct]]
  *    mirrors it);
  *  - NULL element in either array → NULL (the HOF dot goes NULL, and
  *    NULL / anything is NULL — even under ANSI, where the zero-divisor
  *    check is skipped for a null numerator); branch emitted only for
  *    `containsNull` schemas;
  *  - zero-norm input → Spark Divide's zero-divisor semantics, captured
  *    from the matched Divide's own evalMode by FuseDistanceRule (or
  *    from the session when built directly): DIVIDE_BY_ZERO under ANSI
  *    (the Spark 4 default), NULL under LEGACY/TRY — never the Java
  *    NaN/Infinity a naive fused ratio would produce. */
case class CosineSim(left: Expression, right: Expression,
    failOnError: Boolean = org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // ragged inputs yield null even when zero-divisor errors are enabled
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }

  private def mayHaveNullElements: Boolean =
    Seq(left.dataType, right.dataType).exists {
      case ArrayType(_, cn) => cn
      case _ => false
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var i0 = 0
    while (i0 < n) {
      if (x.isNullAt(i0) || y.isNullAt(i0)) return null
      i0 += 1
    }
    var dp = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dp += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) {
      if (failOnError)
        throw org.apache.spark.sql.graft.ColumnBridge.divideByZeroError()
      null
    } else dp / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val dp = ctx.freshName("dp")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      val nullCheck = if (mayHaveNullElements)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dp = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dp += $xi * $yi;
         |    $na += $xi * $xi;
         |    $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    if ($denom == 0.0) {
         |      ${if (failOnError)
                 "throw org.apache.spark.sql.graft.ColumnBridge.divideByZeroError();"
               else s"${ev.isNull} = true;"}
         |    } else {
         |      ${ev.value} = $dp / $denom;
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused SQ4 (packed-nibble) decoded squared-L2 — the performance form
  * of SqIndex.sq4DistHof: the packed array holds two 4-bit codes per
  * long (high nibble = even dim), so `d` rides as a constructor
  * parameter (it is not recoverable from the array length when d is
  * odd). Per dim: integer unpack (exact — b>>4 / b&15 ≡ the HOF's
  * shiftright/% on 0..255 values), recon = vmin + code·scale in double,
  * left-to-right accumulation — numerics IDENTICAL to the HOF form
  * (parity spec-gated), so swapping it in cannot change the
  * q_sq4_knn / q_ivfsq4_knn / q_quant_error oracle results.
  */
case class Sq4Distance(
    left: Expression,
    right: Expression,
    d: Int,
    vmin: Array[Double],
    scale: Array[Double])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // null (not garbage) on an undersized input array — see nullSafeEval
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sq4_distance expects (array<float>, array<long>), got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val packed = b.asInstanceOf[ArrayData]
    // an undersized packed array would read past numElements() on
    // UnsafeArrayData SILENTLY (garbage distances, no error) — the HOF
    // form yields null via element_at; match that contract
    if (packed.numElements() < (d + 1) / 2 || q.numElements() < d) return null
    var acc = 0.0
    var i = 0
    while (i < d) {
      val byte = packed.getLong(i >> 1)
      val code = if ((i & 1) == 0) byte >> 4 else byte & 15L
      val recon = vmin(i) + code.toDouble * scale(i)
      val diff = q.getFloat(i).toDouble - recon
      acc += diff * diff
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val vminRef = ctx.addReferenceObj("sq4Vmin", vmin, "double[]")
      val scaleRef = ctx.addReferenceObj("sq4Scale", scale, "double[]")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val byte = ctx.freshName("packedByte")
      val code = ctx.freshName("code")
      val recon = ctx.freshName("recon")
      val diff = ctx.freshName("diff")
      s"""
         |if ($b.numElements() < ${(d + 1) / 2} || $a.numElements() < $d) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    long $byte = $b.getLong($i >> 1);
         |    long $code = (($i & 1) == 0) ? ($byte >> 4) : ($byte & 15L);
         |    double $recon = $vminRef[$i] + (double) $code * $scaleRef[$i];
         |    double $diff = (double) $a.getFloat($i) - $recon;
         |    $acc += $diff * $diff;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused SQ8 decoded squared-L2 (the performance form of
  * SqIndex.sqDistHof): Σ_i (q_i − (vmin_i + codes_i·scale_i))² as one
  * primitive loop in whole-stage codegen; the (vmin, scale) model rides
  * along as JVM reference objects, not literal expression trees, so
  * generated-code size is O(1) in the dimensionality.
  *
  * Numerics are IDENTICAL to the HOF form (per-element double cast,
  * recon = vmin + code·scale, left-to-right accumulation) — parity
  * spec-gated, so swapping it in cannot change the q_sq8_knn oracle
  * result.
  */
case class SqDistance(
    left: Expression,
    right: Expression,
    vmin: Array[Double],
    scale: Array[Double])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sq_distance expects (array<float>, array<long>), got ($l, $r)")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val d = codes.numElements()
    var acc = 0.0
    var i = 0
    while (i < d) {
      val recon = vmin(i) + codes.getLong(i).toDouble * scale(i)
      val diff = q.getFloat(i).toDouble - recon
      acc += diff * diff
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val vminRef = ctx.addReferenceObj("sqVmin", vmin, "double[]")
      val scaleRef = ctx.addReferenceObj("sqScale", scale, "double[]")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val recon = ctx.freshName("recon")
      val diff = ctx.freshName("diff")
      s"""
         |double $acc = 0.0;
         |int $d = $b.numElements();
         |for (int $i = 0; $i < $d; $i++) {
         |  double $recon = $vminRef[$i] + (double) $b.getLong($i) * $scaleRef[$i];
         |  double $diff = (double) $a.getFloat($i) - $recon;
         |  $acc += $diff * $diff;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
