package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** MinHash-LSH stage attribution harness (local measurement tool, not
  * part of the driver contract — the [[Profile]] family): times the
  * three stages of q_minhash_lsh's exact configuration SEPARATELY so a
  * scaling tail can be attributed to the stage that grew —
  *
  *   1. `sig`    — shingle → 16-hash signature over every doc,
  *                 materialized (linear in rows; the fast family also
  *                 carries the md5 group hash for the r14 collapse),
  *   2. `band`   — band/bucket grouping → candidate pairs, materialized
  *                 (bound by bucket co-occupancy ≈ pair volume; the
  *                 fast family's stage is the r14 COLLAPSED form —
  *                 verbatim-replica collapse + rep band join + closure
  *                 expansion, scored candidates out),
  *   3. `verify` — exact shingle-Jaccard join over the candidates,
  *                 thresholded (linear in candidates × shingle size;
  *                 the md5 family's stage also computes the signature
  *                 estimate here).
  *
  * Stages 2 and 3 read the PREVIOUS stage's checkpoint, so each number
  * is that stage's own cost, not a cumulative prefix. The verify stage
  * calls the PRODUCTION scoring functions ([[Dedup.verifyCandidates]]
  * for md5, [[Dedup.scoreCandidates]] + [[Dedup.verifyScoredCandidates]]
  * for fast — the same composition [[Dedup.minhashLshDupsFast]] runs),
  * so the measured stage cannot drift from the pipeline it attributes
  * (ADVICE r11).
  *
  *   sbt "runMain graft.MinhashStages /tmp/graft_scale_100x 3 [fast] [direct]"
  * Prints one JSON line {"sig":s,"band":s,"verify":s,"pairs":n,...}
  * per-stage medians over the given reps. A third arg `fast` times the
  * xxhash64 family ([[Dedup.minhashSignatureFast]]) instead of md5 —
  * the measured answer to the signature-dominated tail. A fourth arg
  * `direct` | `collapsed` (fast only) pins the r14 regime switch to
  * one branch, so the collapse's band-stage effect on a boilerplate
  * fixture is an A/B of two runs with identical pair counts. A fifth
  * arg `bandonly` skips the verify stage — the giant-cloud A/B's pair
  * table is output-sized (hundreds of millions of rows) and timing
  * verify there measures the output volume, not the band plan.
  */
object MinhashStages {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val fast = args.length > 2 && args(2) == "fast"
    val forced: Option[Boolean] =
      if (args.length > 3 && args(3) == "direct") Some(false)
      else if (args.length > 3 && args(3) == "collapsed") Some(true)
      else None
    val bandOnly = args.length > 4 && args(4) == "bandonly"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (shingleN, numHashes, bands, threshold) = (3, 16, 4, 0.8)
    val rowsPerBand = numHashes / bands

    def time[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val sigT = Array.newBuilder[Double]
    val bandT = Array.newBuilder[Double]
    val verifyT = Array.newBuilder[Double]
    var nPairs = 0L
    var nDups = 0L
    for (_ <- 1 to reps) {
      // fast family (r14): the production stages are the COLLAPSED
      // composition minhashFastCandidatesScored runs — sig = the
      // (doc_id, ghash, sig) map pass; band = replica collapse + rep
      // band join + closure expansion (scored candidates out); verify =
      // the exact-Jaccard threshold. md5 family: the pre-collapse
      // reference stages, unchanged.
      val (ts, sigs) = time(
        if (fast) Dedup.minhashCollapsedSigs(docs, shingleN, numHashes, "text")
        else Dedup.minhashSignature(docs, shingleN, numHashes).localCheckpoint(true))
      sigT += ts
      val (tb, pairs) = time(
        (if (fast)
          // `direct`/`collapsed` pin the regime branch so the A/B
          // measures the two plans, not the adaptive decision
          Dedup.collapsedScoredCandidates(sigs, numHashes, bands,
            forceCollapse = forced)
         else Dedup.lshCandidates(sigs, bands, rowsPerBand)).localCheckpoint(true))
      bandT += tb
      nPairs = pairs.count()
      // construct INSIDE the timed block: DataFrame construction is lazy
      // today, but an eager step introduced later (a checkpoint, a
      // build-time job) must land in the stage it belongs to, not escape
      // the clock (ADVICE r12 — an eager checkpoint in verify had done
      // exactly that)
      if (!bandOnly) {
        val (tv, verified) = time {
          val v =
            if (fast)
              Dedup.verifyScoredCandidates(docs, pairs, shingleN, threshold)
            else Dedup.verifyCandidates(sigs, pairs, numHashes, threshold)
          v.write.format("noop").mode("overwrite").save()
          v
        }
        verifyT += tv
        nDups = verified.count()
      } else verifyT += 0.0
    }
    println(s"""{"dir":"$dir","family":"${if (fast) "xxhash64" else "md5"}","reps":$reps,""" +
      s""""sig":${f"${median(sigT.result().toSeq)}%.3f"},""" +
      s""""band":${f"${median(bandT.result().toSeq)}%.3f"},""" +
      s""""verify":${f"${median(verifyT.result().toSeq)}%.3f"},""" +
      s""""candidate_pairs":$nPairs,"dup_pairs":$nDups}""")
    spark.stop()
  }
}
