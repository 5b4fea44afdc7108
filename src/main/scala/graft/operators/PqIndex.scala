package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Product-quantization ANN — codebook build, encoding, and ADC search
  * (SURVEY §2.3 J3, §2.4 A3; reference IVFPQ build
  * vector_search_cluster.py:1033-1041: m = max(1, d/4) subquantizers,
  * 8 bits each).
  *
  * The vector is split into `m` subvectors of `subDim = d/m`; each subspace
  * has a `ksub`-entry codebook; a vector is stored as `m` small codes
  * (d×4 B → m×1 B, the reference's ~16× compression — SURVEY §4). Search is
  * asymmetric distance computation (ADC): per query, a LUT of
  * subspace×code partial distances; a candidate's distance is the sum of
  * `m` LUT entries.
  *
  * Scale design: codebooks are tiny (m×ksub×subDim floats) and inlined as
  * literals → encoding is map-side codegen, no shuffle. The per-query LUT
  * table is Q×m×ksub doubles, nested per query row and broadcast; ADC is
  * then a broadcast nested-loop pass over the codes table — no shuffle of
  * the big side, exactly the reference's scan-with-LUT inner loop.
  */
object PqIndex {

  /** Codebooks: m × ksub × subDim, `codebooks(s)(c)` = centroid of code c
    * in subspace s. */
  type Codebooks = Array[Array[Array[Float]]]

  /** Deterministic codebooks — subspace s's code c is the s-th slice of
    * the vector with vec_id = c. SQL-reproducible stand-in for per-subspace
    * k-means (A3); quality training is [[trainCodebooks]]. */
  def seedCodebooks(embeddings: DataFrame, m: Int, subDim: Int, ksub: Int): Codebooks = {
    val rows = embeddings
      .where(col("vec_id") < ksub)
      .orderBy(col("vec_id"))
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    Array.tabulate(m)(s => rows.map(v => v.slice(s * subDim, (s + 1) * subDim)))
  }

  /** A3 — per-subspace k-means codebooks via MLlib, trained on a bounded
    * sample (reference trains on the first batch only, :1156-1159). */
  def trainCodebooks(
      embeddings: DataFrame,
      m: Int,
      subDim: Int,
      ksub: Int,
      seed: Long = 42L,
      trainSample: Int = 10000,
      maxIter: Int = 10): Codebooks = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // deterministic sample: first-N by id (TakeOrderedAndProject, no global sort)
    val sample = embeddings.orderBy(col("vec_id")).limit(trainSample)
      .select(col("embedding")).cache()
    try {
      Array.tabulate(m) { s =>
        val sub = sample.select(
          array_to_vector(slice(col("embedding"), s * subDim + 1, subDim)).as("features"))
        new KMeans().setK(ksub).setSeed(seed + s).setMaxIter(maxIter)
          .fit(sub).clusterCenters.map(_.toArray.map(_.toFloat))
      }
    } finally sample.unpersist()
  }

  /** Above this total entry count (m×ksub), the per-element literal form
    * of [[cbLit]] is replaced by a single encoded literal — one codegen
    * reference object instead of one expression node per code — keeping
    * generated-code size O(1) in the codebook size (same gate rationale
    * as [[IvfIndex.LiteralCentroidMax]]; value-identical, spec-asserted). */
  val LiteralCodebookMax = 4096

  /** Nested array<array<struct<code,vec>>> — codebooks by value into the
    * plan. Small sets inline per-element; large sets single-literal. */
  private def cbLit(cb: Codebooks, litMax: Int): Column =
    if (cb.iterator.map(_.length).sum <= litMax)
      array(cb.toIndexedSeq.map { sub =>
        array(sub.zipWithIndex.toIndexedSeq.map { case (v, c) =>
          struct(lit(c.toLong).as("code"), typedLit(v).as("vec"))
        }: _*)
      }: _*)
    else {
      val entries: Seq[Seq[(Long, Array[Float])]] =
        cb.toIndexedSeq.map(_.zipWithIndex.toIndexedSeq.map { case (v, c) => (c.toLong, v) })
      transform(typedLit(entries), sub =>
        transform(sub, e =>
          struct(e.getField("_1").as("code"), e.getField("_2").as("vec"))))
    }

  /** Encode a vector column to its m codes: per subspace, argmin over that
    * subspace's codebook (ties to the lowest code). Fused one-pass
    * expression (graft.plans.PqEncode — codebooks by value, O(1) codegen
    * size at any m×ksub), value-identical to [[encodeExprHof]]
    * (parity-tested). Map-side, no shuffle: this is the corpus-side PQ
    * build loop. */
  def encodeExpr(vec: Column, cb: Codebooks, m: Int, subDim: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.PqEncode(ColumnBridge.expression(vec), cb, subDim))
  }

  /** HOF reference form of [[encodeExpr]] (parity-tested; mirrors the
    * q_pq_adc_knn oracle's encode CTE). `litMax` gates the per-element
    * vs single-encoded-literal codebook form (see [[LiteralCodebookMax]]). */
  def encodeExprHof(vec: Column, cb: Codebooks, m: Int, subDim: Int,
      litMax: Int = LiteralCodebookMax): Column =
    transform(sequence(lit(0), lit(m - 1)), s =>
      array_min(
        transform(element_at(cbLit(cb, litMax), (s + 1).cast("int")), e =>
          struct(
            Distances.l2SqFast(
              slice(vec, s * subDim + 1, lit(subDim)), e.getField("vec")).as("dist"),
            e.getField("code").as("code"))))
        .getField("code"))

  /** Codes table: (vec_id, codes array<long>) + passthrough columns. */
  def encode(embeddings: DataFrame, cb: Codebooks, m: Int, subDim: Int): DataFrame =
    embeddings.withColumn("codes", encodeExpr(col("embedding"), cb, m, subDim))

  /** Per-query ADC LUT: array<array<double>> — lut(s)(c) = ‖q_s − cb_s,c‖². */
  def lutExpr(qvec: Column, cb: Codebooks, m: Int, subDim: Int,
      litMax: Int = LiteralCodebookMax): Column =
    transform(sequence(lit(0), lit(m - 1)), s =>
      transform(element_at(cbLit(cb, litMax), (s + 1).cast("int")), e =>
        Distances.l2SqFast(slice(qvec, s * subDim + 1, lit(subDim)), e.getField("vec"))))

  /** ADC distance: sum over subspaces (ascending s — reproducible fold) of
    * the LUT entry selected by the candidate's code. Fused codegen
    * expression (graft.plans.AdcDistance) — value-identical to
    * [[adcDistHof]] (parity-tested). */
  def adcDist(lut: Column, codes: Column, m: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.AdcDistance(
      ColumnBridge.expression(lut), ColumnBridge.expression(codes)))
  }

  /** HOF reference form of [[adcDist]] (parity-tested; mirrors the
    * q_pq_adc_knn DuckDB oracle SQL shape). */
  def adcDistHof(lut: Column, codes: Column, m: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
      acc + element_at(
        element_at(lut, (s + 1).cast("int")),
        (element_at(codes, (s + 1).cast("int")) + 1).cast("int")))

  /** End-to-end PQ self-search with deterministic codebooks — the
    * oracle-able ADC path. */
  def selfSearchSeeded(
      embeddings: DataFrame,
      numQueries: Int,
      m: Int,
      subDim: Int,
      ksub: Int,
      k: Int): DataFrame = {
    val cb = seedCodebooks(embeddings, m, subDim, ksub)
    search(embeddings, encode(embeddings, cb, m, subDim), cb, numQueries, m, subDim, k)
  }

  /** PQ self-search with k-means-trained codebooks (recall-tested). */
  def selfSearchTrained(
      embeddings: DataFrame,
      numQueries: Int,
      m: Int,
      subDim: Int,
      ksub: Int,
      k: Int,
      seed: Long = 42L): DataFrame = {
    val cb = trainCodebooks(embeddings, m, subDim, ksub, seed)
    search(embeddings, encode(embeddings, cb, m, subDim), cb, numQueries, m, subDim, k)
  }

  /** ADC shortlist + exact re-rank: PQ distances select `shortlist`
    * candidates per query, which are re-scored with true L2² against the
    * raw vectors — the standard IVFPQ recall-recovery step. Scale: the
    * shortlist is Q×shortlist rows (tiny) → the re-rank join is a
    * broadcast semi-join against the embeddings table. */
  def selfSearchReranked(
      embeddings: DataFrame,
      numQueries: Int,
      m: Int,
      subDim: Int,
      ksub: Int,
      k: Int,
      shortlist: Int,
      seed: Long = 42L): DataFrame = {
    val cb = trainCodebooks(embeddings, m, subDim, ksub, seed)
    val short = search(embeddings, encode(embeddings, cb, m, subDim), cb, numQueries, m, subDim, shortlist)
      .select(col("query_id"), col("vec_id"))
    val q = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    embeddings
      .join(broadcast(short), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        Distances.l2SqFast(col("qvec"), col("embedding")).as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** PQ4 packing (the FAISS `PQx4` / fast-scan layout, ksub = 16): two
    * subspace codes per byte — packed(j) = code_{2j}·16 + code_{2j+1}
    * (1-based element indexing, even subspaces in the high nibble, the
    * [[SqIndex.encode4Expr]] convention). FAISS packs 4-bit codes for
    * SIMD LUT shuffles; relationally the win is the same storage one —
    * the codes column halves again vs byte codes. Pass the CODES COLUMN
    * (not a fresh encode expression) so the m-way argmin evaluates once
    * per row, not once per packed element. */
  def packCodes4(codes: Column, m: Int): Column =
    transform(sequence(lit(0), lit(m / 2 - 1)), j =>
      element_at(codes, (j * 2 + 1).cast("int")) * 16L +
        element_at(codes, (j * 2 + 2).cast("int")))

  /** ADC over packed 4-bit codes: exact integer nibble unpack
    * (shiftright/mod), then the same ascending-s LUT fold as
    * [[adcDistHof]] — value-identical to ADC over the unpacked codes
    * because unpack(pack(c)) ≡ c for c ∈ [0, 15]. */
  def adcDist4(lut: Column, packed: Column, m: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) => {
      val b = element_at(packed, (shiftright(s.cast("int"), 1) + 1).cast("int"))
      val code = when(s % 2 === 0,
        shiftright(b.cast("int"), 4).cast("long")).otherwise(b % 16L)
      acc + element_at(
        element_at(lut, (s + 1).cast("int")), (code + 1).cast("int"))
    })

  /** End-to-end PQ4 self-search with deterministic ksub=16 codebooks —
    * the [[selfSearchSeeded]] protocol over nibble-packed codes. */
  def selfSearchSeeded4(
      embeddings: DataFrame,
      numQueries: Int,
      m: Int,
      subDim: Int,
      k: Int): DataFrame = {
    require(m % 2 == 0, "PQ4 packing needs an even subspace count")
    val cb = seedCodebooks(embeddings, m, subDim, ksub = 16)
    val codes4 = embeddings
      .withColumn("_c", encodeExpr(col("embedding"), cb, m, subDim))
      .select(col("vec_id"), packCodes4(col("_c"), m).as("codes4"))
    val luts = embeddings
      .where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"),
        lutExpr(col("embedding"), cb, m, subDim).as("lut"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    codes4
      .crossJoin(broadcast(luts))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        adcDist4(col("lut"), col("codes4"), m).as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  private[operators] def search(
      embeddings: DataFrame,
      codes: DataFrame,
      cb: Codebooks,
      numQueries: Int,
      m: Int,
      subDim: Int,
      k: Int): DataFrame = {
    val luts = embeddings
      .where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"),
        lutExpr(col("embedding"), cb, m, subDim).as("lut"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    codes
      .crossJoin(broadcast(luts))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        adcDist(col("lut"), col("codes"), m).as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }
}
