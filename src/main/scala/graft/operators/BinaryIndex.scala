package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary (sign-bit) quantization + Hamming k-NN — the FAISS
  * `IndexBinaryFlat` family: each dimension contributes one bit
  * (1 ⟺ value > 0), vectors become ⌈d/32⌉ packed words (128-d floats →
  * 16 bytes, a 32× compression), and search ranks by Hamming distance
  * (popcount of XOR). The coarsest, fastest tier of the quantization
  * ladder (binary ≺ SQ8 ≺ PQ ≺ full precision), and — like SQ8 but
  * unlike trained PQ — fully deterministic, so the whole path is
  * DuckDB-oracle-checkable.
  *
  * 32 bits per word (not 64): packed values stay ≤ 2³², so the
  * sum-of-distinct-powers packing is overflow-free in BOTH engines and
  * the oracle SQL needs no two's-complement care.
  *
  * Scale: encoding is a map-side projection (pure built-ins inside
  * whole-stage codegen); search is the FLAT broadcast shape over a 32×
  * smaller table — scan-bound at 100 TB→3 TB of codes, with the same
  * partial/final WindowGroupLimit top-k merge.
  */
object BinaryIndex {

  /** Pack dims [w·32, w·32+32) into one long: Σ 2^j over positive dims.
    * Integer sum of distinct powers ≡ bitwise OR — fold-order-free.
    * Unrolled as 32 literal-shift terms (the bit values are compile-time
    * constants) so the packing is a flat codegen'd integer sum — no
    * sequence/lambda allocation and no floating-point pow per element. */
  private def packWord(vec: Column, w: Int): Column =
    (0 until 32).map { j =>
      when(element_at(vec, lit(w * 32 + j + 1)) > 0f, lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Sign-binarize a d-dim float vector into ⌈d/32⌉ packed longs. */
  def encode(vec: Column, d: Int): Column = {
    require(d % 32 == 0, s"dim $d must be a multiple of 32")
    array((0 until d / 32).map(w => packWord(vec, w)): _*)
  }

  /** Hamming distance between two packed-code arrays. */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Binary shortlist → exact full-precision re-rank (the standard
    * binary-quantization serving recipe: Hamming prunes, L2 decides).
    * `signSource` lets the sign bits come from a TRANSFORMED view of the
    * same ids — pass a seeded-rotation projection ([[Rotation]]) for the
    * modern rotate-then-sign composition (a random rotation spreads
    * variance evenly across dims, so every sign bit carries information;
    * plain sign bits waste bits on low-variance dims). The re-rank
    * always scores RAW vectors, so rotation never changes the final
    * metric. Shortlist rows are Q×`shortlist` — the re-rank join is the
    * PQ re-rank shape (broadcast shortlist semi-join).
    * Output: (query_id, rank, vec_id, dist). */
  def selfSearchReranked(
      embeddings: DataFrame,
      d: Int,
      numQueries: Int,
      k: Int,
      shortlist: Int,
      signSource: Option[DataFrame] = None): DataFrame = {
    val signs = signSource.getOrElse(embeddings)
    val sl = selfSearch(signs, d, numQueries, shortlist)
      .select(col("query_id"), col("vec_id"))
    val qs = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    sl.join(embeddings.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(qs), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.Distances.l2Sq(col("embedding"), col("qvec")).as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Self-search: first `numQueries` ids as queries, Hamming top-k over
    * the binarized table (ties by vec_id). Output: (query_id, rank,
    * vec_id, hamming). */
  def selfSearch(embeddings: DataFrame, d: Int, numQueries: Int,
      k: Int): DataFrame = {
    val codes = embeddings.select(col("vec_id"),
      encode(col("embedding"), d).as("code"))
    val q = codes.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("code").as("qcode"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("hamming"), col("vec_id"))
    codes.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        hamming(col("qcode"), col("code")).as("hamming"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), col("hamming"))
      .orderBy(col("query_id"), col("rank"))
  }
}
