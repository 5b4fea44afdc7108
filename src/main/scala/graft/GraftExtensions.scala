package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.plans._

/** SQL-surface registration for the fused expressions — a user of the
  * reference switching to this library gets them as plain SQL functions
  * (`SELECT l2_sq(a.embedding, b.embedding) ...`), the same way FAISS's
  * metric is implicit in its API (SURVEY §2.10).
  *
  * Two wiring paths, same descriptors:
  *   - config: `spark.sql.extensions=graft.GraftExtensions`
  *   - programmatic: `GraftFunctions.register(spark)` on a live session.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, builder) for every SQL-expressible fused expression. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "l2_sq" -> {
      case Seq(a, b) => L2SqDistance(a, b)
      case args => throw new IllegalArgumentException(s"l2_sq expects 2 args, got ${args.length}")
    },
    "dot_product" -> {
      case Seq(a, b) => DotProduct(a, b)
      case args => throw new IllegalArgumentException(s"dot_product expects 2 args, got ${args.length}")
    },
    "cosine_sim" -> {
      case Seq(a, b) => CosineSim(a, b)
      case args => throw new IllegalArgumentException(s"cosine_sim expects 2 args, got ${args.length}")
    },
    "adc_distance" -> {
      case Seq(lut, codes) => AdcDistance(lut, codes)
      case args => throw new IllegalArgumentException(s"adc_distance expects 2 args, got ${args.length}")
    },
    "simhash64" -> {
      case Seq(tokens) => SimHash64(tokens)
      case args => throw new IllegalArgumentException(s"simhash64 expects 1 arg, got ${args.length}")
    },
    "jaccard_sim" -> {
      case Seq(a, b) => JaccardSim(a, b)
      case args => throw new IllegalArgumentException(s"jaccard_sim expects 2 args, got ${args.length}")
    },
    "hamming_distance" -> {
      case Seq(a, b) => HammingDistance(a, b)
      case args => throw new IllegalArgumentException(s"hamming_distance expects 2 args, got ${args.length}")
    },
    "shingle_windows" -> {
      case Seq(tokens, n) => ShingleWindows(tokens, intLit(n, "shingle_windows n"))
      case args => throw new IllegalArgumentException(s"shingle_windows expects 2 args, got ${args.length}")
    },
    "pair_windows" -> {
      case Seq(tokens) => PairWindows(tokens)
      case args => throw new IllegalArgumentException(s"pair_windows expects 1 arg, got ${args.length}")
    },
    "top_token_count" -> {
      case Seq(tokens) => TopTokenCount(tokens)
      case args => throw new IllegalArgumentException(s"top_token_count expects 1 arg, got ${args.length}")
    },
    "min_shingle_hash" -> {
      case Seq(tokens, n) => MinShingleHash(tokens, intLit(n, "min_shingle_hash n"))
      case args => throw new IllegalArgumentException(s"min_shingle_hash expects 2 args, got ${args.length}")
    },
    "minhash_signature" -> {
      case Seq(shingles, h) => MinHashSignature(shingles, intLit(h, "minhash_signature numHashes"))
      case args => throw new IllegalArgumentException(s"minhash_signature expects 2 args, got ${args.length}")
    },
    "sq_distance" -> {
      case Seq(q, codes, vmin, scale) =>
        SqDistance(q, codes,
          doubleArrayLit(vmin, "sq_distance vmin"),
          doubleArrayLit(scale, "sq_distance scale"))
      case args => throw new IllegalArgumentException(s"sq_distance expects 4 args, got ${args.length}")
    },
    "ngram_windows" -> {
      case Seq(tokens, n) => NgramWindows(tokens, intLit(n, "ngram_windows n"))
      case args => throw new IllegalArgumentException(s"ngram_windows expects 2 args, got ${args.length}")
    },
    "text_stats" -> {
      case Seq(text, stops) => TextStats(text, stringArrayLit(stops, "text_stats stopwords"))
      case args => throw new IllegalArgumentException(s"text_stats expects 2 args, got ${args.length}")
    },
    "bloom_might_contain" -> {
      case Seq(s, filter) => BloomMightContain(s, binaryLit(filter, "bloom_might_contain filter"))
      case args => throw new IllegalArgumentException(s"bloom_might_contain expects 2 args, got ${args.length}")
    },
    "mat_vec" -> {
      case Seq(v, m) => MatVec(v, floatMatrixLit(m, "mat_vec matrix"))
      case args => throw new IllegalArgumentException(s"mat_vec expects 2 args, got ${args.length}")
    },
    "centroid_argmin" -> {
      case Seq(v, cids, cents) =>
        CentroidArgmin(v, longArrayLit(cids, "centroid_argmin cids"),
          floatMatrixLit(cents, "centroid_argmin centroids"))
      case args => throw new IllegalArgumentException(s"centroid_argmin expects 3 args, got ${args.length}")
    },
    "pq_encode" -> {
      case Seq(v, cb, subDim) =>
        PqEncode(v, floatCubeLit(cb, "pq_encode codebooks"), intLit(subDim, "pq_encode subDim"))
      case args => throw new IllegalArgumentException(s"pq_encode expects 3 args, got ${args.length}")
    },
    "mmr_select" -> {
      case Seq(c, lam, m) =>
        MmrSelect(c, numLit(lam, "mmr_select lambda"), intLit(m, "mmr_select m"))
      case args => throw new IllegalArgumentException(s"mmr_select expects 3 args, got ${args.length}")
    })

  /** Fold a constant array<double> argument (an array(...) literal in
    * SQL) down to the JVM array the expression embeds. */
  private def doubleArrayLit(e: Expression, what: String): Array[Double] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val ok = e.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!e.foldable || !ok)
      throw new IllegalArgumentException(
        s"$what must be a constant array<double>, got $e")
    e.eval().asInstanceOf[ArrayData].toDoubleArray()
  }

  private def requireConst(e: Expression, what: String): Any = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$what must be a constant, got $e")
    e.eval()
  }

  private def numLit(e: Expression, what: String): Double = requireConst(e, what) match {
    case n: java.lang.Number => n.doubleValue()
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => throw new IllegalArgumentException(s"$what must be numeric, got $other")
  }

  private def longArrayLit(e: Expression, what: String): Array[Long] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}
    e.dataType match {
      case ArrayType(LongType, _) =>
        requireConst(e, what).asInstanceOf[ArrayData].toLongArray()
      case ArrayType(IntegerType, _) =>
        requireConst(e, what).asInstanceOf[ArrayData].toIntArray().map(_.toLong)
      case t => throw new IllegalArgumentException(s"$what must be a constant array<bigint>, got $t")
    }
  }

  private def stringArrayLit(e: Expression, what: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    e.dataType match {
      case ArrayType(StringType, _) =>
        val a = requireConst(e, what).asInstanceOf[ArrayData]
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      case t => throw new IllegalArgumentException(s"$what must be a constant array<string>, got $t")
    }
  }

  private def binaryLit(e: Expression, what: String): Array[Byte] = {
    import org.apache.spark.sql.types.BinaryType
    e.dataType match {
      case BinaryType => requireConst(e, what).asInstanceOf[Array[Byte]]
      case t => throw new IllegalArgumentException(s"$what must be a constant binary, got $t")
    }
  }

  /** Constant array<array<float|double>> → JVM float matrix (SQL float
    * literals usually arrive as doubles; narrow them). */
  private def floatMatrixLit(e: Expression, what: String): Array[Array[Float]] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    def row(a: ArrayData, innerFloat: Boolean): Array[Float] =
      if (innerFloat) a.toFloatArray() else a.toDoubleArray().map(_.toFloat)
    e.dataType match {
      case ArrayType(ArrayType(FloatType, _), _) =>
        val a = requireConst(e, what).asInstanceOf[ArrayData]
        Array.tabulate(a.numElements())(i => row(a.getArray(i), innerFloat = true))
      case ArrayType(ArrayType(DoubleType, _), _) =>
        val a = requireConst(e, what).asInstanceOf[ArrayData]
        Array.tabulate(a.numElements())(i => row(a.getArray(i), innerFloat = false))
      case t => throw new IllegalArgumentException(
        s"$what must be a constant array<array<float|double>>, got $t")
    }
  }

  /** Constant 3-level float array (PQ codebooks: m × ksub × subDim). */
  private def floatCubeLit(e: Expression, what: String): Array[Array[Array[Float]]] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val innerFloat = e.dataType match {
      case ArrayType(ArrayType(ArrayType(FloatType, _), _), _) => true
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => false
      case t => throw new IllegalArgumentException(
        s"$what must be a constant array<array<array<float|double>>>, got $t")
    }
    val a = requireConst(e, what).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements()) { i =>
      val sub = a.getArray(i)
      Array.tabulate(sub.numElements()) { j =>
        val v = sub.getArray(j)
        if (innerFloat) v.toFloatArray() else v.toDoubleArray().map(_.toFloat)
      }
    }
  }

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft", name)

  /** Register every function on a live session (idempotent), and hook
    * the HOF-distance fusion rule into the session's optimizer (the
    * live-session analog of injectOptimizerRule). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      org.apache.spark.sql.graft.FunctionBridge.register(spark, name, info(name), builder)
    }
    if (!spark.experimental.extraOptimizations.contains(FuseDistanceRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseDistanceRule
  }

  /** Inject into a SparkSessionExtensions (for spark.sql.extensions). */
  def inject(ext: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
    // optimizer rule: HOF distance patterns → fused codegen expressions
    ext.injectOptimizerRule(_ => FuseDistanceRule)
  }
}

/** `spark.sql.extensions=graft.GraftExtensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
