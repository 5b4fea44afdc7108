package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding merge training — the tokenizer-construction side of
  * the training-data pipeline. [[graft.functions.TextFunctions.wordBigrams]]
  * (q_bigram_stats) computes the INPUT statistic of one merge round; this
  * operator runs the actual iterative algorithm (Sennrich et al. 2016):
  * split every word type into symbols, repeatedly count adjacent symbol
  * pairs weighted by word frequency, merge the most frequent pair, and
  * emit the learned merge table in order.
  *
  * Scale design: the loop runs over the WORD-TYPE dictionary, not the
  * corpus — one corpus-sized aggregation up front (map-side combinable
  * `groupBy(word).count`), then every round touches only the vocabulary,
  * which is Heaps'-law sublinear in corpus size (the same bounded-model
  * rule as KMeans/PQ/PCA training). Per round: one pair-count aggregate
  * (shuffle carries distinct pairs — at most vocab × avg-word-length),
  * one `limit(1).collect()` control-plane argmax, one map-side merge
  * application, and an eager `localCheckpoint` to truncate the iterative
  * lineage (same discipline as [[Dedup.dupClusters]]).
  *
  * Fully deterministic: argmax ties break on (pair count desc, left asc,
  * right asc), and symbol splitting/merging is pure string algebra — the
  * spec pins the exact merge table on a classic corpus.
  */
object BpeTrain {

  /** One learned merge. */
  final case class Merge(rank: Long, left: String, right: String, pairCount: Long)

  /** Word-type frequency dictionary of a corpus — the only corpus-sized
    * pass of the trainer. */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    // tokenize+explode is the corpus-pass map work; spread a
    // single-split scan across the cores first (identity at scale)
    ScanSpread.spreadSmall(docs)
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Initial symbol split: one single-character symbol per position. */
  def charSplit(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => substring(word, i, lit(1)))
      .cast("array<string>")

  /** Apply one merge (a,b)→ab to a symbol array, left to right,
    * non-overlapping — a fold where the merged symbol cannot itself pair
    * with the preceding occurrence of `b` (so "aaa" under (a,a) becomes
    * ["aa","a"], matching the standard implementation). */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Adjacent symbol pairs of each word, weighted by word frequency,
    * summed over the dictionary. */
  private def pairCounts(dict: DataFrame): DataFrame =
    dict.select(col("freq"),
      explode(when(size(col("syms")) >= 2,
        transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("left"),
            element_at(col("syms"), (i + 1).cast("int")).as("right"))))
        .otherwise(array().cast("array<struct<left:string,right:string>>")))
        .as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("freq")).as("pair_count"))

  /** Learn `numMerges` merges from a corpus. Returns the merge table
    * (rank, left, right, pair_count) in learning order; stops early if no
    * pair remains. */
  def train(docs: DataFrame, numMerges: Int, textCol: String = "text"): Seq[Merge] = {
    var dict = wordFreqs(docs, textCol)
      .withColumn("syms", charSplit(col("word")))
      .select(col("freq"), col("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val top = pairCounts(dict)
        .orderBy(col("pair_count").desc, col("left"), col("right"))
        .limit(1).collect() // control-plane: one row
      if (top.isEmpty) done = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank.toLong, l, r, c)
        // dict flows LINEARLY through applyMerge (one reference per round),
        // so the plan grows linearly, not exponentially like dupClusters'
        // twice-referenced labels — a checkpoint every round is pure job
        // overhead. Materialize every 4th round: recompute depth stays
        // ≤ 4 nested merges while half the per-round jobs disappear.
        dict = dict.withColumn("syms", applyMerge(col("syms"), l, r))
        if (rank % 4 == 0) dict = dict.localCheckpoint(true)
        rank += 1
      }
    }
    merges.toSeq
  }

  /** [[train]] as a DataFrame (the q_bpe_merges registry shape). */
  def trainDF(docs: DataFrame, numMerges: Int, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, numMerges, textCol).toDF("rank", "left", "right", "pair_count")
      .orderBy(col("rank"))
  }

  /** Tokenize text with a learned merge table: split to characters, apply
    * every merge in rank order — the inference side of BPE, as a single
    * map-side chain (no shuffle; the merge table is plan literals). */
  def encodeExpr(text: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(charSplit(text)) { (syms, m) =>
      applyMerge(syms, m.left, m.right)
    }

  /** Per-document BPE token counts under a learned merge table — the
    * token-budget statistic every context-packing / pricing / mixing
    * stage consumes, computed with the REAL tokenizer rather than the
    * whitespace proxy.
    *
    * BPE encoding is a function of the word TYPE, so the merge chain
    * (an interpreted HOF fold — the expensive part) runs once per
    * DISTINCT word, not once per occurrence: distinct words (the
    * Heaps'-law vocabulary, same bounded-model rule as [[train]])
    * encode via [[encodeExpr]], the symbol counts broadcast-join back
    * onto the occurrence stream, and the per-doc sums combine map-side
    * (the shuffle carries one row per doc per partition). The first
    * per-occurrence form of this benched 18.9 s at sf0.1 — the
    * type-level rewrite runs the fold ~30× less. At extreme vocabularies
    * (≫10⁷ types) swap the broadcast for a shuffle join — the counts
    * are identical.
    *
    * Output: (doc_id, n_words, n_bpe_tokens); n_words ≤ n_bpe_tokens ≤
    * character count, shrinking as merges grow. */
  def tokenCounts(docs: DataFrame, merges: Seq[Merge], textCol: String = "text"): DataFrame = {
    val toks = filter(TextFunctions.tokens(col(textCol)), w => w =!= "")
    val dw = docs.select(col("doc_id"), explode(toks).as("word"))
    val dict = dw.select(col("word")).distinct()
      .withColumn("n_syms", size(encodeExpr(col("word"), merges)).cast("long"))
    val counts = dw.join(broadcast(dict), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum(col("n_syms")).as("n_bpe_tokens"))
    docs.select(col("doc_id")).join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
      .orderBy(col("doc_id"))
  }
}
