package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashed-linear text-classifier INFERENCE — the "quality classifier"
  * stage of LLM data pipelines (fastText-style filters: CCNet's LM
  * gate, LLaMA's Wikipedia-reference classifier, GPT-3's WebText
  * quality model): every document gets a linear score over hashed
  * word-n-gram features, score = Σ_g w[b(g)] / |grams|, and is kept
  * iff the score clears a threshold. Features default to the unigram
  * bag (fastText's wordNgrams=1 default); wordNgrams=2 adds word
  * bigrams — the same feature plane as [[Dsir]].
  *
  * The weight table stands in for a trained model and is md5-derived
  * (w_j = 2·u_j − 1 with u_j uniform from md5("qc:j")) — DETERMINISTIC
  * and replayed verbatim by the DuckDB oracle, so the full inference
  * path (feature hash → weight lookup → order-pinned fold → threshold)
  * is hash-checked end to end; swapping in trained weights changes one
  * literal map, not the plan. The sigmoid is omitted deliberately: it
  * is monotone, so thresholding the raw mean logit is the same
  * decision rule without a transcendental in the parity contract.
  *
  * Scale (100 TB): pure map-side — the B-entry weight map rides as a
  * broadcast literal (model-plane, KB-sized like a real fastText
  * model), each doc scores inside one codegen projection; no shuffle,
  * no UDF. Classifier filtering is embarrassingly parallel and this is
  * the plan it should have. Reference anchor: the reference gates
  * vectors on metadata predicates (vector_search_cluster.py:330-356);
  * the classifier is that gate's text-pipeline generalization, and it
  * shares [[Dsir]]'s hashed-feature plane (same bucket rule, same
  * tokenize-once representation).
  */
object QualityClassifier {

  /** Deterministic md5-derived weight table (bucket → weight in (−1, 1)):
    * u = (int(md5hex8(seed:j)) + 0.5) / 2³², w = 2u − 1. DuckDB replays
    * it as 2*((('0x'||substr(md5('qc:'||j),1,8))::BIGINT+0.5)/2^32)-1. */
  def syntheticWeights(b: Int, seed: String = "qc"): Map[Long, Double] =
    (0L until b.toLong).map { j =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$seed:$j".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      j -> (2.0 * u - 1.0)
    }.toMap

  /** Per-document mean-logit score + keep decision over a documents
    * table. Output: (doc_id, n_grams, score, keep) — score is the
    * round-4 mean of the per-gram weights via a SORTED left-to-right
    * fold (the oracle's list_sort + list_sum reproduces the double sum
    * exactly); keep compares the UNROUNDED mean to the threshold.
    * `wordNgrams` mirrors fastText's knob: 1 (fastText's default) =
    * unigram bag; 2 adds word bigrams ([[Dsir]]'s feature plane). */
  def score(
      docs: DataFrame,
      weights: Map[Long, Double],
      b: Int,
      threshold: Double = 0.0,
      textCol: String = "text",
      wordNgrams: Int = 1): DataFrame = {
    val feats =
      if (wordNgrams >= 2) Dsir.grams(col(textCol))
      else graft.functions.TextFunctions.tokens(col(textCol))
    val wMap = typedlit(weights)
    val wArr = transform(feats, g => element_at(wMap, Dsir.bucketOf(g, b)))
    // NOTE (r15): ScanSpread.spreadSmall was tried here and reverted —
    // the per-gram weight lookup is cheap enough that the round-robin
    // exchange bought nothing (JobTrace steady ~1.0 s both ways) and it
    // would cost this operator its no-corpus-shuffle plan property.
    docs
      // NULL-text docs are DROPPED, matching the oracle: its unnest of a
      // NULL gram list yields no rows, so such a doc never reaches the
      // group-by. Without this filter the engine would emit a
      // (doc_id, null, null, null) row the oracle doesn't have — a
      // latent row-count divergence (no-op on the generated data, which
      // has no null text).
      .where(col(textCol).isNotNull)
      .select(col("doc_id"), wArr.as("wts"))
      .withColumn("mean_logit",
        aggregate(sort_array(col("wts")), lit(0.0d), (acc, x) => acc + x) /
          size(col("wts")).cast("double"))
      .select(
        col("doc_id"),
        size(col("wts")).cast("long").as("n_grams"),
        round(col("mean_logit"), 4).as("score"),
        (col("mean_logit") > threshold).as("keep"))
  }
}
