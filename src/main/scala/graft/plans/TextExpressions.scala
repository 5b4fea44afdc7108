package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
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
  private[plans] val digest = new ThreadLocal[MessageDigest] {
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

/** Distinct word n-gram shingles from a token array in one pass —
  * value-identical to the HOF form
  * `when(size(toks) >= n, array_distinct(transform(sequence(1, size-n+1),
  * i => concat_ws(" ", slice(toks, i, n))))).otherwise(array())`
  * (TextFunctions.wordShinglesHof): windows of n consecutive tokens
  * joined with a single space, deduplicated keeping first-occurrence
  * order; fewer than n tokens → empty array. The fused form builds each
  * shingle with one UTF8String concat and dedups in a LinkedHashSet —
  * no per-window lambda dispatch, no intermediate slice arrays. */
case class ShingleWindows(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_windows expects array<string>, got $t")
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val windows = toks.numElements() - n + 1
    if (windows <= 0) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[UTF8String]((windows * 2) max 16)
      val window = new Array[UTF8String](n)
      var i = 0
      while (i < windows) {
        var j = 0
        while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(space, window: _*))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        seen.toArray.asInstanceOf[Array[AnyRef]])
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Word n-gram windows WITH multiplicity from a token array in one
  * pass — ShingleWindows minus the distinct set (the occurrence unit of
  * the duplicated-n-gram fraction). Value-identical to the HOF form
  * `when(size(toks) >= n, transform(sequence(1, size-n+1), i ->
  * concat_ws(" ", slice(toks, i, n)))).otherwise(array())`, which
  * re-evaluates the token split inside the per-window lambda —
  * O(tokens²) per row; this is one pass over the materialized array. */
case class NgramWindows(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ngram_windows expects array<string>, got $t")
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val windows = toks.numElements() - n + 1
    if (windows <= 0) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[AnyRef](windows)
      val window = new Array[UTF8String](n)
      var i = 0
      while (i < windows) {
        var j = 0
        while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(space, window: _*)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Adjacent token pairs WITH multiplicity from a token array in one
  * pass — ShingleWindows at n=2 minus the distinct set. Value-identical
  * to the HOF form `when(size(toks) >= 2, transform(sequence(1, size-1),
  * i => concat_ws(" ", toks[i], toks[i+1]))).otherwise(array())`
  * (TextFunctions.wordBigramsHof). The HOF form re-evaluates the token
  * array inside the per-element lambda (O(tokens²) per row); the fused
  * form is one pass over the materialized array. */
case class PairWindows(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pair_windows expects array<string>, got $t")
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val windows = toks.numElements() - 1
    if (windows <= 0) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](windows)
      var i = 0
      while (i < windows) {
        out(i) = UTF8String.concatWs(space, toks.getUTF8String(i), toks.getUTF8String(i + 1))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Highest single-token occurrence count in a token array, one pass —
  * the numerator of the Gopher-style "top word fraction" repetition
  * signal (a document dominated by one repeated token is boilerplate).
  * Value-identical to the HOF form
  * `array_max(transform(array_distinct(toks), t => size(filter(toks,
  * x => x === t))))` (TextFunctions.topTokenCountHof) — which is
  * O(distinct·n) per row where this is one hash-map pass. Empty → 0. */
case class TopTokenCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"top_token_count expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n == 0) 0L
    else {
      val counts = new java.util.HashMap[UTF8String, Int]((n * 2) max 16)
      var best = 0
      var i = 0
      while (i < n) {
        val c = counts.merge(toks.getUTF8String(i), 1, (a, b) => a + b)
        if (c > best) best = c
        i += 1
      }
      best.toLong
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Minimum 60-bit shingle hash over a token array in one pass — the doc
  * fingerprint. Value-identical to
  * `array_min(transform(wordShingles(text, n), md5Long))` (and the DuckDB
  * `list_aggregate(list_transform(sh, s -> ('0x'||substr(md5(s),1,15))::BIGINT), 'min')`
  * oracle): for each window of `n` consecutive tokens, md5 of the
  * space-joined shingle bytes, value = first 15 hex digits as a long
  * (big-endian first 8 bytes >>> 4). Distinctness is irrelevant under
  * min; fewer than `n` tokens → null (empty-array array_min). The fused
  * form streams tokens straight into the digest — no shingle strings,
  * no intermediate arrays, no per-element lambda dispatch. */
case class MinShingleHash(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"min_shingle_hash expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val windows = toks.numElements() - n + 1
    if (windows <= 0) null
    else {
      val d = TextExpressions.digest.get()
      var min = Long.MaxValue
      var i = 0
      while (i < windows) {
        d.reset()
        var j = 0
        while (j < n) {
          if (j > 0) d.update(' '.toByte)
          d.update(toks.getUTF8String(i + j).getBytes)
          j += 1
        }
        val md5 = d.digest()
        val v = (((md5(0) & 0xffL) << 56) | ((md5(1) & 0xffL) << 48) |
          ((md5(2) & 0xffL) << 40) | ((md5(3) & 0xffL) << 32) |
          ((md5(4) & 0xffL) << 24) | ((md5(5) & 0xffL) << 16) |
          ((md5(6) & 0xffL) << 8) | (md5(7) & 0xffL)) >>> 4
        if (v < min) min = v
        i += 1
      }
      min
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature over a shingle array in one pass. Value-identical to
  * the HOF form (Dedup.minhashSignatureHof / the q_minhash_lsh oracle):
  * entry h = lexicographic min over shingles of md5("<h>:" + shingle) as
  * a 32-char hex string. Hex strings sort like their digest bytes
  * compared unsigned (nibble→hex-char mapping is monotonic), so the min
  * is tracked on raw digests and hex-encoded once at the end. Empty
  * shingle arrays yield all-null entries (array_min of empty), matching
  * the HOF form. One digest object, no intermediate hex arrays, H×S md5s
  * with zero lambda dispatch. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_signature expects array<string>, got $t")
  }

  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(bytes: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    val digits = "0123456789abcdef".getBytes
    var i = 0
    while (i < 16) {
      out(2 * i) = digits((bytes(i) >>> 4) & 0xf)
      out(2 * i + 1) = digits(bytes(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val s = shingles.numElements()
    val out = new Array[Any](numHashes)
    if (s > 0) {
      val d = TextExpressions.digest.get()
      val shingleBytes = Array.tabulate(s)(i => shingles.getUTF8String(i).getBytes)
      var h = 0
      while (h < numHashes) {
        val prefix = (h.toString + ":").getBytes("US-ASCII")
        var min: Array[Byte] = null
        var i = 0
        while (i < s) {
          d.reset()
          d.update(prefix)
          d.update(shingleBytes(i))
          val dig = d.digest()
          if (min == null || less(dig, min)) min = dig
          i += 1
        }
        out(h) = hex(min)
        h += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The FAST MinHash family fused into one pass: entry h = signed-long
  * min over shingles of xxhash64(h, shingle) — value-identical to the
  * HOF form (Dedup.minhashSignatureFastHof, parity-tested), replicating
  * Spark's own XxHash64 fold (seed 42, hashInt(h) then
  * hashUTF8String with the running hash as seed). One UTF8String fetch
  * per shingle, H seeds precomputed once, zero lambda dispatch and no
  * digesting/hex — the knob the measured 100× stage split points at
  * (SCALE.md: signature compute = 82 % of MinHash LSH pipeline cost;
  * md5 is kept as the oracle-parity family). Empty shingle arrays yield
  * all-null entries, matching array_min of empty. */
case class MinHashSignatureFast(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_signature_fast expects array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val shingles = input.asInstanceOf[ArrayData]
    val s = shingles.numElements()
    val out = new Array[Any](numHashes)
    if (s > 0) {
      // xxhash64(lit(h), sh) = hashUTF8String(sh, hashInt(h, 42))
      val seeds = Array.tabulate(numHashes)(h => XXH64.hashInt(h, 42L))
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < s) {
        val sh = shingles.getUTF8String(i)
        var h = 0
        while (h < numHashes) {
          val v = XXH64.hashUTF8String(sh, seeds(h))
          if (v < mins(h)) mins(h) = v
          h += 1
        }
        i += 1
      }
      var h = 0
      while (h < numHashes) { out(h) = mins(h); h += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Bloom-filter membership probe over a string column: the serialized
  * filter rides in the expression by value (one reference object,
  * broadcast with the task binary — same pattern as the centroid
  * matrix) and deserializes once per executor. Equivalent to
  * `filter.mightContainString(col)` — probes the UTF-8 bytes directly,
  * no per-row String allocation. Spark's own BloomFilterMightContain is
  * private[sql]; this is the public-surface equivalent. */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"bloom_might_contain expects string, got $t")
  }

  @transient private lazy val filter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(input: Any): Any =
    filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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

/** Every counting signal of the text-quality family in ONE pass over the
  * raw string — value-identical to the multi-pass built-in forms it
  * replaces (parity-tested per field):
  *
  *   - n_tokens  = size(split(trim(text), "\s+"))   — including Java
  *     split's limit=-1 edge semantics: the space-only trim, the leading
  *     empty token when the trimmed text starts with non-space
  *     whitespace, the trailing empty token when it ends with one, and
  *     the single empty token of an empty/space-only string
  *   - n_bpe     = size(regexp_extract_all(text, "[a-z]+|[0-9]|[^a-z0-9\s]"))
  *   - len_sum   = aggregate(tokens, 0L, (acc, t) -> acc + length(t))
  *   - alpha     = length(regexp_replace(text, "[^a-z]", ""))
  *   - stop_hits = size(filter(tokens, t -> t in stopwords))
  *   - char_len  = length(text)   (codepoints)
  *
  * The quality queries derive every ratio/score from these counts with
  * the same Column arithmetic as before, so division/rounding semantics
  * are untouched — only the string scanning is fused (the built-in form
  * re-tokenizes per signal: ~8 regex splits + 2 full-regex passes per
  * row, plus a very wide expression tree that dominates plan/codegen
  * time). */
case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {

  private lazy val stopSet: Set[String] = stopwords.toSet

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_bpe", LongType, nullable = false),
    StructField("len_sum", LongType, nullable = false),
    StructField("alpha", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("char_len", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"text_stats expects string, got $t")
  }

  // Java regex \s without UNICODE_CHARACTER_CLASS: exactly these six
  @inline private def isWs(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    // full-text pass: codepoint length, [a-z] count, BPE-ish token count
    var charLen = 0L; var alpha = 0L; var bpe = 0L
    var inAlphaRun = false
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      charLen += 1
      if (cp >= 'a' && cp <= 'z') {
        alpha += 1
        if (!inAlphaRun) { bpe += 1; inAlphaRun = true }
      } else {
        inAlphaRun = false
        if ((cp >= '0' && cp <= '9') || !isWs(cp)) bpe += 1
      }
      i += Character.charCount(cp)
    }
    // token pass over the space-trimmed region (trim() strips 0x20 only)
    var a = 0; var b = n
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    var nTok = 0L; var lenSum = 0L; var stopHits = 0L
    if (a == b) nTok = 1L // empty -> [""]
    else {
      if (isWs(s.charAt(a))) nTok += 1 // leading empty token
      i = a
      while (i < b) {
        if (isWs(s.charAt(i))) i += 1
        else {
          val st = i
          var cps = 0L
          while (i < b && !isWs(s.charAt(i))) {
            i += Character.charCount(s.codePointAt(i))
            cps += 1
          }
          nTok += 1
          lenSum += cps
          if (stopSet.contains(s.substring(st, i))) stopHits += 1
        }
      }
      if (isWs(s.charAt(b - 1))) nTok += 1 // trailing empty token
    }
    InternalRow(nTok, bpe, lenSum, alpha, stopHits, charLen)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
