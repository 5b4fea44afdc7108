package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) ANN — the third FAISS-standard compression
  * path next to PQ ([[PqIndex]]) and IVFPQ ([[IvfPqIndex]]): each
  * dimension is independently quantized to one byte against per-dimension
  * [min, max] bounds (FAISS `IndexScalarQuantizer(d, QT_8bit)` semantics),
  * a 4× memory cut with far better distance fidelity than PQ's 16×.
  *
  * Search decodes candidates on the fly and ranks by squared L2 to the
  * reconstructed vector — deterministic arithmetic end to end, so the
  * whole path is DuckDB-oracle-checkable (no recall gate needed).
  *
  * Scale design: training is one map-side-combinable aggregate (d groups
  * — the shuffle carries d×partitions rows, not the corpus); the (vmin,
  * scale) model is 2×d doubles inlined as literals, so encoding and
  * distance are shuffle-free codegen'd projections; search broadcasts
  * only the Q query vectors and ranks with the same partial/final
  * window-top-k as the FLAT path — no shuffle of the codes table.
  */
object SqIndex {

  /** Per-dimension (vmin, scale) with scale = (vmax − vmin)/255 — the
    * QT_8bit training step. Exact corpus min/max (not sampled) so the
    * model, and therefore every downstream code, is engine-reproducible:
    * min/max are order-insensitive and float→double is exact, so the
    * vectorized one-pass Summarizer aggregate yields bit-identical bounds
    * to a per-element explode (which would blow every d-dim row into d
    * shuffle-input rows — pure overhead at corpus scale). */
  def trainMinMax(embeddings: DataFrame, d: Int): (Array[Double], Array[Double]) =
    trainBounds(embeddings, d, levels = 255.0)

  /** One bounds pass serving several level counts: (vmin, scale per
    * levels entry), each scale computed directly as (vmax − vmin)/L
    * from the SAME exact bounds — bit-identical to per-level
    * [[trainMinMax]]/[[trainMinMax4]] calls without re-scanning the
    * corpus once per rung (the quant-error report trains SQ8 and SQ4
    * from one pass). */
  def trainBoundsMulti(embeddings: DataFrame, d: Int,
      levels: Seq[Double]): (Array[Double], Seq[Array[Double]]) = {
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.stat.Summarizer
    val row = embeddings
      .select(Summarizer.metrics("min", "max")
        .summary(array_to_vector(col("embedding"))).as("s"))
      .select(col("s.min"), col("s.max"))
      .head()
    val lo = row.getAs[org.apache.spark.ml.linalg.Vector](0).toArray
    val hi = row.getAs[org.apache.spark.ml.linalg.Vector](1).toArray
    val scales = levels.map { l =>
      val scale = new Array[Double](d)
      var i = 0
      while (i < d) { scale(i) = (hi(i) - lo(i)) / l; i += 1 }
      scale
    }
    (lo, scales)
  }

  /** Shared bounds pass: scale = (vmax − vmin)/levels. Computed directly
    * from the exact bounds (NOT rescaled from another level count —
    * (x/255)·255/15 ≠ x/15 in floating point, and the oracle computes
    * (vmax−vmin)/15 directly). Delegates to [[trainBoundsMulti]] so the
    * Summarizer pass has exactly one body — the "bit-identical to
    * separate passes" guarantee rests on one implementation, not two
    * hand-synchronized copies. */
  private def trainBounds(embeddings: DataFrame, d: Int,
      levels: Double): (Array[Double], Array[Double]) = {
    val (lo, scales) = trainBoundsMulti(embeddings, d, Seq(levels))
    (lo, scales.head)
  }

  /** Byte codes: code_i = clamp(round((x_i − vmin_i)/scale_i), 0, 255);
    * a constant dimension (scale 0) encodes as 0. */
  def encodeExpr(vec: Column, vmin: Array[Double], scale: Array[Double]): Column = {
    val vminL = typedLit(vmin.toSeq)
    val scaleL = typedLit(scale.toSeq)
    transform(vec, (x, i) => {
      val idx = (i + 1).cast("int")
      when(element_at(scaleL, idx) === 0.0, lit(0L))
        .otherwise(least(lit(255L), greatest(lit(0L),
          round((x.cast("double") - element_at(vminL, idx)) /
            element_at(scaleL, idx)).cast("long"))))
    })
  }

  /** Codes table: (vec_id, codes array<long>) + passthrough columns. */
  def encode(embeddings: DataFrame, vmin: Array[Double], scale: Array[Double]): DataFrame =
    embeddings.withColumn("codes", encodeExpr(col("embedding"), vmin, scale))

  /** Squared L2 between a raw query vector and a reconstructed candidate:
    * Σ_i (q_i − (vmin_i + codes_i·scale_i))², as a fused codegen loop
    * (graft.plans.SqDistance) — bit-identical to [[sqDistHof]]
    * (parity-tested). */
  def sqDist(qvec: Column, codes: Column, d: Int,
      vmin: Array[Double], scale: Array[Double]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.SqDistance(
      ColumnBridge.expression(qvec), ColumnBridge.expression(codes), vmin, scale))
  }

  /** HOF reference form of [[sqDist]] (ascending-i fold, mirrors the
    * q_sq8_knn oracle SQL shape). */
  def sqDistHof(qvec: Column, codes: Column, d: Int,
      vmin: Array[Double], scale: Array[Double]): Column = {
    val vminL = typedLit(vmin.toSeq)
    val scaleL = typedLit(scale.toSeq)
    aggregate(sequence(lit(0), lit(d - 1)), lit(0.0), (acc, i) => {
      val idx = (i + 1).cast("int")
      val recon = element_at(vminL, idx) +
        element_at(codes, idx).cast("double") * element_at(scaleL, idx)
      val diff = element_at(qvec, idx).cast("double") - recon
      acc + diff * diff
    })
  }

  /** SQ4 bounds: scale = (vmax − vmin)/15 — FAISS `QT_4bit` semantics,
    * the 8× rung of the compression ladder (fp32 → SQ8 → SQ4 → binary). */
  def trainMinMax4(embeddings: DataFrame, d: Int): (Array[Double], Array[Double]) =
    trainBounds(embeddings, d, levels = 15.0)

  /** PACKED 4-bit codes — the representation IS the point at 100 TB
    * (two dims per byte, half the array entries of SQ8): element j holds
    * code_{2j}·16 + code_{2j+1}, codes clamped to [0, 15]. Odd d pads
    * the final high nibble's partner with code 0 and the distance loop
    * simply never reads it. */
  def encode4Expr(vec: Column, vmin: Array[Double], scale: Array[Double]): Column = {
    val vminL = typedLit(vmin.toSeq)
    val scaleL = typedLit(scale.toSeq)
    val d = vmin.length
    def code(i: Column): Column = { // i is 1-based dim index
      val x = element_at(vec, i.cast("int"))
      when(element_at(scaleL, i.cast("int")) === 0.0, lit(0L))
        .otherwise(least(lit(15L), greatest(lit(0L),
          round((x.cast("double") - element_at(vminL, i.cast("int"))) /
            element_at(scaleL, i.cast("int"))).cast("long"))))
    }
    transform(sequence(lit(0), lit((d + 1) / 2 - 1)), j => {
      val hi = code(j * 2 + 1)
      val lo = if (d % 2 == 0) code(j * 2 + 2)
        else when(j * 2 + 2 <= d, code(j * 2 + 2)).otherwise(lit(0L))
      hi * 16L + lo
    })
  }

  /** Squared L2 against an SQ4-packed candidate, as a fused codegen
    * loop (graft.plans.Sq4Distance) — bit-identical to [[sq4DistHof]]
    * (parity-tested), the same codegen-over-interpreted-HOF swap the
    * SQ8 path got (the interpreted fold was q_sq4_knn's whole cost). */
  def sq4Dist(qvec: Column, packed: Column, d: Int,
      vmin: Array[Double], scale: Array[Double]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.Sq4Distance(
      ColumnBridge.expression(qvec), ColumnBridge.expression(packed), d, vmin, scale))
  }

  /** HOF reference form of [[sq4Dist]]: unpack both nibbles of
    * each byte (div/mod — exact integer arithmetic), reconstruct, fold
    * ascending (oracle-mirrored shape). */
  def sq4DistHof(qvec: Column, packed: Column, d: Int,
      vmin: Array[Double], scale: Array[Double]): Column = {
    val vminL = typedLit(vmin.toSeq)
    val scaleL = typedLit(scale.toSeq)
    aggregate(sequence(lit(0), lit(d - 1)), lit(0.0), (acc, i) => {
      val byteIdx = (shiftright(i.cast("int"), 1) + 1).cast("int")
      val b = element_at(packed, byteIdx)
      // exact integer unpack: high nibble for even dims, low for odd
      val codeI = when(i % 2 === 0,
        shiftright(b.cast("int"), 4).cast("long")).otherwise(b % 16L)
      val idx = (i + 1).cast("int")
      val recon = element_at(vminL, idx) +
        codeI.cast("double") * element_at(scaleL, idx)
      val diff = element_at(qvec, idx).cast("double") - recon
      acc + diff * diff
    })
  }

  /** End-to-end SQ4 self-search — the [[selfSearch]] protocol over the
    * packed codes. Same scale shape: model literals, shuffle-free
    * encode+distance projections, broadcast queries, per-query window. */
  def selfSearch4(embeddings: DataFrame, numQueries: Int, d: Int, k: Int): DataFrame = {
    val (vmin, scale) = trainMinMax4(embeddings, d)
    val codes = embeddings
      .select(col("vec_id"), encode4Expr(col("embedding"), vmin, scale).as("codes4"))
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    codes
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        sq4Dist(col("qvec"), col("codes4"), d, vmin, scale).as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** End-to-end SQ8 self-search: train bounds, encode, rank by decoded
    * L2² — same query protocol as the FLAT path (queries = vec_id <
    * numQueries, self excluded, ties by vec_id). */
  def selfSearch(embeddings: DataFrame, numQueries: Int, d: Int, k: Int): DataFrame = {
    val (vmin, scale) = trainMinMax(embeddings, d)
    val codes = encode(embeddings, vmin, scale)
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    codes
      .crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        sqDist(col("qvec"), col("codes"), d, vmin, scale).as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }
}
