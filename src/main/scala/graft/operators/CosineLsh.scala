package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Random-hyperplane LSH for cosine similarity — the bucketed scale path
  * for embedding similarity search (SimHash-for-vectors): sign of the dot
  * product against P fixed hyperplanes gives a P-bit bucket; cosine-close
  * vectors collide with high probability. Search probes the query's bucket
  * plus all 1-bit-flip neighbors (multi-probe), ranks candidates by true
  * cosine distance.
  *
  * Scale design: bucketing is a map-side codegen expression; the
  * candidate join is an equi-join on bucket strings (shuffle bounded by
  * collision counts, AQE-skew-splittable); no all-pairs work anywhere.
  * Hyperplanes are deterministic (seeded) small integers so the DuckDB
  * oracle can embed the identical planes as literals.
  */
object CosineLsh {

  /** Deterministic hyperplanes: values in {-2,-1,0,1,2} from a seeded
    * java.util.Random (stable LCG across platforms). */
  def planes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)((rnd.nextInt(5) - 2).toFloat))
  }

  /** P-char bucket bitstring: bit p = [dot(vec, plane_p) >= 0]. */
  def bucketExpr(vec: Column, ps: Array[Array[Float]]): Column =
    concat(ps.toIndexedSeq.map { p =>
      when(Distances.dotFast(vec, typedLit(p)) >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** The query's probe set: its own bucket plus each 1-bit flip. */
  def probeBucketsExpr(bucket: Column, numPlanes: Int): Column =
    array((bucket +: (0 until numPlanes).map { p =>
      concat(
        bucket.substr(lit(1), lit(p)),
        when(bucket.substr(lit(p + 1), lit(1)) === "1", lit("0")).otherwise(lit("1")),
        bucket.substr(lit(p + 2), lit(numPlanes - p - 1)))
    }): _*)

  /** LSH-bucketed cosine self-search: top-k by true cosine distance among
    * bucket-colliding candidates (query's bucket + 1-bit flips). Queries
    * with fewer than k candidates return fewer rows — approximate by
    * construction, deterministic by construction. */
  def selfSearch(
      embeddings: DataFrame,
      numQueries: Int,
      numPlanes: Int,
      k: Int,
      seed: Long = 42L): DataFrame = {
    val ps = planes(numPlanes, embeddings.select(col("embedding")).head()
      .getSeq[Float](0).length, seed)
    val sigs = embeddings
      .select(col("vec_id"), col("embedding"),
        bucketExpr(col("embedding"), ps).as("bucket"))
    val probes = sigs
      .where(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        explode(probeBucketsExpr(col("bucket"), numPlanes)).as("bucket"))
    val cand = sigs.join(broadcast(probes), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qvec"), col("vec_id"), col("embedding"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    cand
      .select(col("query_id"), col("vec_id"),
        Distances.cosineDistFast(col("qvec"), col("embedding")).as("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }
}
