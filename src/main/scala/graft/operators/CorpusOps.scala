package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-assembly operators for the LLM-pipeline surface — the steps
  * between "deduped documents" and "training batches": dedup against an
  * already-ingested corpus, deterministic source mixing, and
  * context-window token packing.
  *
  * Scale design: incremental dedup is one hash equi-join (anti) — the
  * batch never moves except by hash; quota selection and packing are
  * windowed per (source[, subshard]) so parallelism is
  * sources × subshards, never a global window.
  */
object CorpusOps {

  /** Dedup a new batch against an already-seen corpus, then within
    * itself: drop docs whose content hash exists in `seen` (left-anti
    * hash join — the standard new-crawl-vs-previous-crawls step), keep
    * the min-doc_id survivor per remaining hash. */
  def incrementalDedup(batch: DataFrame, seen: DataFrame,
      textCol: String = "text"): DataFrame = {
    val seenHashes = seen.select(md5(col(textCol)).as("content_hash")).distinct()
    val hashed = batch.withColumn("content_hash", md5(col(textCol)))
    val w = Window.partitionBy(col("content_hash"))
    hashed
      .join(seenHashes, Seq("content_hash"), "left_anti")
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .where(col("doc_id") === col("canonical_id"))
      .drop("canonical_id")
  }

  /** Bloom-pruned form of [[incrementalDedup]] — result-identical, for
    * the regime where `seen` is huge and the batch mostly novel: a Bloom
    * filter over the seen hashes (built once, broadcast with the task
    * binary) drops definite-novel rows MAP-SIDE; only possible-dupes
    * (the filter's false-positive sliver) reach the exact anti-join, so
    * the join input shrinks from |batch| to ~|actual dupes| + fpp·|batch|.
    * Exactness is preserved because the Bloom filter only PRUNES the
    * join's probe side — every kept row is still verified exactly. */
  def incrementalDedupBloom(batch: DataFrame, seen: DataFrame,
      textCol: String = "text", fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val seenHashed = seen.select(md5(col(textCol)).as("content_hash"))
    val n = math.max(seenHashed.count(), 1L)
    val bloom = seenHashed.stat.bloomFilter("content_hash", n, fpp)
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bloom.writeTo(out)
      out.toByteArray
    }
    val hashed = batch.withColumn("content_hash", md5(col(textCol)))
    val mightBeSeen = ColumnBridge.column(graft.plans.BloomMightContain(
      ColumnBridge.expression(col("content_hash")), bytes))
    val definiteNovel = hashed.where(!mightBeSeen)
    val maybeSeen = hashed.where(mightBeSeen)
      .join(seenHashed.distinct(), Seq("content_hash"), "left_anti")
    val survivors = definiteNovel.unionByName(maybeSeen)
    val w = Window.partitionBy(col("content_hash"))
    survivors
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .where(col("doc_id") === col("canonical_id"))
      .drop("canonical_id")
  }

  /** Deterministic corpus shuffle: global order by md5 of the doc id — a
    * reproducible, engine-portable stand-in for the training-time random
    * shuffle (the reference's unseeded np.random.shuffle, D1, made
    * deterministic). Spark executes it as a range-partitioned sort —
    * a linear distributed pass, no single-task stage. */
  def deterministicShuffle(docs: DataFrame): DataFrame =
    docs
      .withColumn("shuffle_key", md5(col("doc_id").cast("string")))
      .orderBy(col("shuffle_key"))

  /** Deterministic source mixing: the first `quota` docs per source in
    * doc_id order — reproducible quota sampling for corpus composition
    * (the deterministic counterpart of fraction-based sampleBy; exact
    * quotas, oracle-checkable, stable across runs). */
  def sourceQuota(docs: DataFrame, quota: Int): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs
      .withColumn("rank_in_source", row_number().over(w).cast("long"))
      .where(col("rank_in_source") <= quota)
  }

  /** Document chunking: split each doc's whitespace tokens into sliding
    * context windows of `chunkTokens` with stride `strideTokens` (overlap
    * = chunk − stride) — the tokenize-and-window step before training
    * batches. Pure per-row explode: chunk count for a doc is
    * 1 + max(0, ⌈(n − chunk)/stride⌉) (every token covered, last window
    * may be short), all integer arithmetic so the layout is
    * engine-reproducible. Emits `chunk_hash` (md5 of the joined window)
    * rather than the window text — the dedup/verification currency.
    *
    * Scale: no shuffle at all — chunking is a map-side explode; output
    * size is (total tokens)/stride rows regardless of doc skew. */
  def chunkByTokens(docs: DataFrame, chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1 && strideTokens >= 1)
    docs
      .withColumn("_toks", split(trim(col("text")), "\\s+"))
      .withColumn("n_tokens", size(col("_toks")).cast("long"))
      .withColumn("chunk_id", explode(sequence(lit(0L),
        greatest(lit(0L),
          expr(s"(n_tokens - $chunkTokens + $strideTokens - 1) DIV $strideTokens")))))
      .withColumn("_window",
        slice(col("_toks"), (col("chunk_id") * strideTokens + 1).cast("int"),
          lit(chunkTokens)))
      .withColumn("chunk_tokens", size(col("_window")).cast("long"))
      .withColumn("chunk_hash", md5(array_join(col("_window"), " ")))
      .drop("_toks", "_window")
  }

  /** Hex threshold for an md5-prefix fraction test: a row whose first 8
    * md5 hex chars compare `<` this string is inside the fraction.
    * The 8-char prefix is uniform over 2^32, so the selected share is
    * within 2^-32 of `frac`. `frac >= 1` returns a sentinel above every
    * hex string ('z' > 'f'), selecting everything. */
  def fracThresholdHex(frac: Double): String =
    if (frac >= 1.0) "zzzzzzzz"
    else f"${math.max((frac * 4294967296.0).toLong, 0L)}%08x"

  private def md5Prefix(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** Deterministic train/val/test split by md5 of the key: membership is
    * a pure row-local function — reproducible across runs, engines, and
    * cluster layouts, recomputable at 100 TB with zero joins or state.
    * (`rand()`-based splits change under retries and repartitioning;
    * this never does.) Adds a `split` column. */
  def hashSplit(docs: DataFrame, key: Column,
      trainFrac: Double, valFrac: Double): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0)
    val p = md5Prefix(key)
    docs.withColumn("split",
      when(p < lit(fracThresholdHex(trainFrac)), "train")
        .when(p < lit(fracThresholdHex(trainFrac + valFrac)), "val")
        .otherwise("test"))
  }

  /** Deterministic stratified sampling: keep each row with a per-stratum
    * fraction (`fracs`, else `default`), decided by md5 of the key — the
    * corpus-mixing knob (downsample web, keep all of wiki) as a pure
    * map-side filter: no sampleBy nondeterminism, no shuffle, and the
    * same doc is kept or dropped in every run. */
  def stratifiedSample(docs: DataFrame, key: Column, stratum: Column,
      fracs: Map[String, Double], default: Double): DataFrame = {
    val thr = fracs.toSeq.sortBy(_._1).foldLeft(
        lit(fracThresholdHex(default))) { case (acc, (s, f)) =>
      when(stratum === s, lit(fracThresholdHex(f))).otherwise(acc)
    }
    docs.where(md5Prefix(key) < thr)
  }

  /** Quantile-based quality filtering — keep docs whose composite
    * quality score ([[TextFunctions.qualityScore]]) is at or above the
    * corpus `pct` quantile (the relative-threshold form of quality
    * pruning: "drop the worst quartile" rather than a magic constant).
    *
    * The threshold is a control-plane scalar; the filter itself is a
    * map-side projection. `exact = true` computes the quantile with the
    * exact single-group `percentile` (buffers every score — the
    * oracle/reference form); the default uses the fixed-size
    * `percentile_approx` sketch, the bounded-memory path for unbounded
    * corpora. */
  def qualityFilter(docs: DataFrame, pct: Double, exact: Boolean = false,
      textCol: String = "text"): DataFrame = {
    val scored = docs.withColumn("quality",
      TextFunctions.qualityScoreFromStats(TextFunctions.textStats(col(textCol))))
    val thrRow =
      if (exact) scored.agg(percentile(col("quality"), lit(pct)))
      else scored.agg(percentile_approx(col("quality"), lit(pct), lit(10000)))
    val thr = thrRow.head().getDouble(0)
    scored.where(col("quality") >= thr)
  }

  /** Benchmark decontamination — the standard eval-set hygiene step:
    * flag every training doc sharing at least one word `n`-gram with the
    * benchmark corpus (the n-gram-collision method used for pretraining
    * decontamination; n≈8-13 in practice). Adds `is_contaminated`.
    *
    * Scale: the benchmark side is tiny by construction (an eval set), so
    * its distinct gram set broadcasts; training docs explode to grams
    * MAP-side and probe the broadcast — the corpus never shuffles. The
    * hit list (contaminated doc ids) is again small → broadcast
    * flag-join back onto the corpus. */
  def decontaminate(train: DataFrame, benchmark: DataFrame, n: Int,
      textCol: String = "text"): DataFrame = {
    val bGrams = benchmark
      .select(explode(TextFunctions.wordShingles(col(textCol), n)).as("gram"))
      .distinct()
    val contaminated = train
      .select(col("doc_id"),
        explode(TextFunctions.wordShingles(col(textCol), n)).as("gram"))
      .join(broadcast(bGrams), Seq("gram"))
      .select(col("doc_id")).distinct()
      .withColumn("is_contaminated", lit(true))
    train
      .join(broadcast(contaminated), Seq("doc_id"), "left")
      .withColumn("is_contaminated",
        coalesce(col("is_contaminated"), lit(false)))
  }

  /** Bloom-pruned [[decontaminate]], result-identical: at 100 TB the
    * benchmark gram set (dozens of evals × all their n-grams) outgrows a
    * comfortable broadcast — a Bloom filter of it is KBs-per-million-
    * grams and rides in the plan, the map-side `might_contain` clears
    * the definitely-clean grams (the overwhelming majority) WITHOUT any
    * join, and only maybe-hits do the exact gram join that removes the
    * false positives. Same novel/maybe split as
    * [[incrementalDedupBloom]]; equality with the exact path is
    * spec-gated. */
  def decontaminateBloom(train: DataFrame, benchmark: DataFrame, n: Int,
      textCol: String = "text", fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    // one evaluation of the benchmark shingling: the count, the Bloom
    // aggregation, and the exact-verify join all read the pinned rows
    // (uncached, each would re-run the explode+distinct shuffle)
    val bGrams = benchmark
      .select(explode(TextFunctions.wordShingles(col(textCol), n)).as("gram"))
      .distinct()
      .localCheckpoint(true)
    val bloom = bGrams.stat.bloomFilter("gram", math.max(bGrams.count(), 1L), fpp)
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bloom.writeTo(out)
      out.toByteArray
    }
    val trainGrams = train
      .select(col("doc_id"),
        explode(TextFunctions.wordShingles(col(textCol), n)).as("gram"))
    val mightHit = ColumnBridge.column(graft.plans.BloomMightContain(
      ColumnBridge.expression(col("gram")), bytes))
    // exact verify kills false positives. NO broadcast hint here, by
    // design: the Bloom path exists precisely for the regime where the
    // benchmark gram set outgrows a comfortable broadcast, so hinting
    // the verify join to broadcast would reintroduce the broadcast the
    // filter obviates. The Bloom prune shrinks the probe side to
    // maybe-hits (~fpp of the corpus grams), so a shuffle join is cheap
    // at scale; at test scale AQE/auto-broadcast picks broadcast on its
    // own from the gram-set stats.
    val contaminated = trainGrams
      .where(mightHit) // map-side: definitely-clean grams never join
      .join(bGrams, Seq("gram"))
      .select(col("doc_id")).distinct()
      .withColumn("is_contaminated", lit(true))
    train
      .join(broadcast(contaminated), Seq("doc_id"), "left")
      .withColumn("is_contaminated",
        coalesce(col("is_contaminated"), lit(false)))
  }

  /** Deterministic weighted source interleaving — the corpus-mixing
    * ORDER: docs from source s appear in the training stream with
    * frequency ∝ `weights(s)` (the deterministic analog of
    * temperature-based source sampling). Each source is shuffled
    * internally (md5 rank — unique, reproducible), then globally ordered
    * by rank/weight: a source with weight 2 places its k-th doc where a
    * weight-1 source places its (k/2)-th, so heavy sources interleave
    * proportionally more often from the very start of the stream.
    *
    * Scale: per-source rank windows parallelize over sources; the global
    * order is a range-partitioned sort (a linear distributed pass) — no
    * global row-number window anywhere. */
  def weightedInterleave(docs: DataFrame,
      weights: Map[String, Double], default: Double): DataFrame = {
    require(default > 0 && weights.values.forall(_ > 0))
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")))
    val weight = weights.toSeq.sortBy(_._1).foldLeft(lit(default)) {
      case (acc, (s, x)) => when(col("source") === s, lit(x)).otherwise(acc)
    }
    docs
      .withColumn("rank_in_source", row_number().over(w).cast("long"))
      .withColumn("mix_key", col("rank_in_source").cast("double") / weight)
      .orderBy(col("mix_key"), col("source"), col("doc_id"))
  }

  /** Chunk-level exact dedup — the chunk-granularity form of
    * [[graft.operators.Dedup.exactDedup]] (RAG ingestion and
    * chunked-pretraining pipelines dedup the CHUNK stream, not whole
    * docs — a doc that shares half its windows with the corpus keeps
    * only its novel half): non-overlapping `chunkTokens` windows hash
    * ([[chunkByTokens]] at stride = chunk), the canonical copy of each
    * hash is the lowest (doc_id, chunk_id), and the per-doc report says
    * what fraction of a doc's chunks were cross-corpus duplicates.
    *
    * Scale: one map-side chunk explode + ONE hash-partitioned window
    * (the exact-dedup shuffle shape, on chunk hashes instead of doc
    * hashes) + a per-doc aggregate. Output: (doc_id, n_chunks,
    * dup_chunks, dup_frac) ordered. */
  def chunkDedupStats(docs: DataFrame, chunkTokens: Int): DataFrame = {
    val w = Window.partitionBy(col("chunk_hash")).orderBy(col("doc_id"), col("chunk_id"))
    chunkByTokens(docs, chunkTokens, chunkTokens)
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("dup_chunks"))
      .withColumn("dup_frac",
        round(col("dup_chunks").cast("double") / col("n_chunks").cast("double"), 4))
      .orderBy(col("doc_id"))
  }

  /** Temperature-based source sampling — the multinomial mixing rule of
    * the standard LLM/multilingual data recipes (p_s ∝ n_s^α; α=1 is
    * natural proportions, α→0 uniform across sources; e.g. α=0.3 in
    * mBERT/XLM-R, α=0.5 common for corpus mixing — with the implicit
    * UniMax-style cap that a source never repeats: quota ≤ n_s).
    * Deterministic materialization against a doc budget T:
    * quota_s = min(⌊T·n_s^α / Σ_t n_t^α⌋, n_s), filled by the
    * md5-ordered first quota_s docs of each source (the same
    * deterministic-random order `weightedInterleave` uses).
    *
    * Scale: source counts are a model-plane aggregate (one row per
    * source); quotas ride as a plan literal; the sample is one
    * per-source window (partitioned — parallel across sources) + filter.
    * Output adds `sample_rank` (1..quota within source). */
  def temperatureSample(docs: DataFrame, totalBudget: Long, alpha: Double): DataFrame = {
    require(totalBudget > 0 && alpha > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val z = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    // quotas ride as a broadcast (source, quota) table — a nested CASE
    // chain would grow the expression tree linearly in source count
    // (thousands of domains in the recipes this implements)
    val quotas = counts.map { case (s, n) =>
      (s, math.min(math.floor(totalBudget * math.pow(n.toDouble, alpha) / z).toLong, n))
    }.toSeq.toDF("source", "_quota")
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq("source"))
      .where(col("sample_rank") <= col("_quota"))
      .drop("_quota")
  }

  /** Context-window packing: assign docs to training bins of ~`budget`
    * tokens. Within each (source, subshard) stream — subshards keep the
    * window parallel at corpus scale — docs in doc_id order land in bin
    * `floor(exclusive-cumulative-tokens / budget)`: deterministic,
    * one-pass, oracle-checkable. Long docs straddle bin boundaries (the
    * usual chunked-packing semantics; splitting spans is a downstream
    * tokenizer concern). */
  def packByTokens(docs: DataFrame, budget: Int, subShards: Int = 16): DataFrame = {
    val sub = pmod(col("doc_id"), lit(subShards.toLong))
    val w = Window.partitionBy(col("source"), sub).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tokens", TextFunctions.tokenCountWs(col("text")))
      .withColumn("subshard", sub)
      // integer division (DIV) keeps the bin exact where a double
      // quotient would lose precision past 2^53 cumulative tokens
      .withColumn("prior_tokens",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", expr(s"prior_tokens DIV $budget"))
      .drop("prior_tokens")
  }

  /** Quantile bucketing — assign each row the index of its value's
    * corpus quantile bucket (decile/percentile binning, the standard
    * feature-engineering / curriculum-bucketing step). Thresholds are
    * the (i/n)-quantiles rounded to 4 decimals (rounding pins the
    * boundary bit-identically across engines); bucket = count of
    * thresholds strictly below the value, so ties at a boundary fall
    * deterministically into the lower bucket.
    *
    * Scale: like [[qualityFilter]], the threshold vector is a
    * control-plane scalar — `exact = true` buffers every value (the
    * oracle/reference form); the default uses the fixed-size
    * `percentile_approx` sketch. The bucketing itself is a map-side
    * when-chain — no shuffle, no join. */
  def quantileBucket(df: DataFrame, valueCol: String, nBuckets: Int,
      exact: Boolean = false): DataFrame = {
    val fracs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val pexpr =
      if (exact) percentile(col(valueCol), typedLit(fracs))
      else percentile_approx(col(valueCol), typedLit(fracs), lit(10000))
    val thr = df.agg(transform(pexpr, x => round(x, 4)).as("t"))
      .head().getSeq[Double](0)
    val bucket = thr.map(t => when(col(valueCol) > t, 1L).otherwise(0L))
      .reduce(_ + _)
    df.withColumn("bucket", bucket)
  }

  /** Weighted sampling WITHOUT replacement — Efraimidis–Spirakis
    * (2006) A-ES: each row draws a deterministic md5 uniform uᵢ and the
    * k rows maximizing uᵢ^(1/wᵢ) are EXACTLY a weight-proportional
    * sample without replacement. Computed in log form (ln uᵢ / wᵢ — the
    * same monotone order, no underflow for huge weights) with the same
    * md5-uniform construction [[graft.operators.Dsir.resample]] uses,
    * so the whole draw is reproducible and DuckDB-replayable. The
    * length-proportional (w = token count) draw this defaults to is the
    * standard "sample tokens, not documents" corpus-subsetting rule.
    *
    * Scale: scoring is pure map-side; selection is `orderBy.limit` ⇒
    * TakeOrdered (per-partition heap + k-row driver merge, no global
    * sort) — the [[graft.operators.Dsir.resample]] shape. Output:
    * (rank, doc_id, weight, sel_key rounded) ordered by rank. */
  def weightedSample(docs: DataFrame, weight: Column, k: Int,
      seed: String = "wsample"): DataFrame = {
    val u = (conv(substring(md5(concat_ws(":", lit(seed), col("doc_id"))), 1, 8), 16, 10)
      .cast("double") + lit(0.5d)) / lit(4294967296.0d)
    val key = log(u) / weight.cast("double")
    val w = Window.orderBy(desc("sel_key"), col("doc_id"))
    docs
      .where(weight > 0) // zero-weight rows are never sampled (and 1/w diverges)
      .withColumn("weight", weight.cast("long"))
      .withColumn("sel_key", key)
      .orderBy(desc("sel_key"), col("doc_id"))
      .limit(k)
      // k-row bounded window (post-limit) — not a corpus-wide sort
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("doc_id"), col("weight"),
        round(col("sel_key"), 6).as("sel_key"))
      .orderBy(col("rank"))
  }

  /** MLM training-example generation — the BERT recipe (Devlin et al.
    * 2019), deterministic: select `maskFrac` of token positions via an
    * md5 uniform on (seed, doc_id, pos); of the selected, 80% become
    * `[MASK]`, 10% a RANDOM vocabulary token, 10% stay unchanged (the
    * published 80/10/10 split — the second uniform and the vocabulary
    * draw come from independent substrings of the same md5, so the
    * whole example set replays bit-identically anywhere, DuckDB
    * included).
    *
    * Scale: tokenize+select is a pure map-side explode+filter (~15% of
    * tokens survive); the vocabulary table (Heaps-law-sized, indexed by
    * a sorted row_number) broadcasts onto only the `random` rows; no
    * corpus shuffle anywhere. Output: (doc_id, pos, token, action,
    * replacement) for the selected positions, ordered. */
  def mlmMask(docs: DataFrame, maskFrac: Double = 0.15,
      textCol: String = "text", seed: String = "mlm"): DataFrame = {
    // both corpus passes (positions + vocab) are tokenize-bound map
    // work; spread a single-split scan across the cores first
    // (identity at scale)
    val spread = ScanSpread.spreadSmall(docs)
    val toks = spread.select(col("doc_id"),
      posexplode(TextFunctions.tokens(col(textCol)))).toDF("doc_id", "pos", "token")
    val h = md5(concat_ws(":", lit(seed), col("doc_id"), col("pos")))
    def uni(from: Int): Column =
      (conv(substring(h, from, 8), 16, 10).cast("double") + lit(0.5d)) /
        lit(4294967296.0d)
    val vocab = spread.select(explode(TextFunctions.tokens(col(textCol))).as("vtok"))
      .distinct()
    val vocabSize = vocab.count() // control-plane scalar (Heaps-law bounded)
    require(vocabSize > 0, "mlmMask: corpus has no tokens — nothing to mask or draw from")
    val indexed = vocab.select(col("vtok"),
      (row_number().over(Window.orderBy(col("vtok"))) - 1).cast("long").as("vidx"))
    val selected = toks
      .where(uni(1) < maskFrac)
      .withColumn("action",
        when(uni(9) < 0.8d, lit("mask"))
          .when(uni(9) < 0.9d, lit("random"))
          .otherwise(lit("keep")))
      .withColumn("vidx",
        when(col("action") === "random",
          pmod(conv(substring(h, 17, 8), 16, 10).cast("long"), lit(vocabSize))))
    selected
      .join(broadcast(indexed), Seq("vidx"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("token"),
        col("action"),
        when(col("action") === "mask", lit("[MASK]"))
          .when(col("action") === "random", col("vtok"))
          .otherwise(col("token")).as("replacement"))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** Corpus snapshot diff (the CDC primitive of an ingest pipeline):
    * given two snapshots keyed by doc_id, classify every id as `added`
    * (new only), `removed` (old only), `changed` (both, different
    * content hash) or `unchanged`. The compare rides on md5 content
    * hashes, never full texts — at 100 TB the diff join shuffles
    * 16-byte hashes + ids, and both sides prune to (doc_id, hash)
    * column scans. One full-outer equi-join on the key; no window, no
    * all-pairs anything. Output: (doc_id, status) for the non-unchanged
    * rows, ordered. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val o = oldDocs.select(col("doc_id"), md5(col(textCol)).as("_old_hash"))
    val n = newDocs.select(col("doc_id"), md5(col(textCol)).as("_new_hash"))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("_old_hash").isNull, lit("added"))
          .when(col("_new_hash").isNull, lit("removed"))
          .when(col("_old_hash") =!= col("_new_hash"), lit("changed"))
          .otherwise(lit("unchanged")))
      .where(col("status") =!= "unchanged")
      .select(col("doc_id"), col("status"))
      .orderBy(col("doc_id"))
  }

  /** 2-D Pareto frontier / skyline (Börzsönyi, Kossmann & Stocker 2001)
    * with both dimensions MAXIMIZED — the data-selection question "which
    * documents are not beaten on BOTH axes" (e.g. longest-and-cleanest:
    * no other doc is at least as long AND at least as clean, with one
    * strictly better). A point survives iff its y equals its x-group's
    * max AND strictly beats the running max-y over all strictly larger
    * x.
    *
    * Scale: the corpus collapses to one (x, maxY) row per DISTINCT x
    * value first, and the running max over that value plane is computed
    * WITHOUT any global window (verdict r7 item 4 — on a continuous x
    * the plane is corpus-sized, so an unpartitioned `orderBy(x.desc)`
    * would funnel it through one task): the
    * [[Dedup.sortedNeighborhoodPairs]] technique — range-partition the
    * plane by x descending, per-PARTITION prefix-max windows run in
    * parallel, and the ≤ numPartitions cross-partition prefix maxes are
    * folded on the driver (control-plane rows, like the even-split
    * offsets). The surviving frontier broadcasts back onto the corpus
    * as one hash join. Dominance on y is compared in double (exact for
    * |y| < 2⁵³ — token counts and scores; the frontier's equality join
    * back to the corpus stays in y's native type). */
  def skyline2D(df: DataFrame, xCol: String, yCol: String,
      idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val perX = df.groupBy(col(xCol)).agg(max(col(yCol)).as("_my"))
      .withColumn("_myd", col("_my").cast("double"))
    // value plane, range-partitioned by x desc; pid = physical partition
    // (the monotonic-id upper bits), checkpointed so the partition-max
    // collect and the frontier read ONE evaluation of the id assignment
    val sorted = perX.repartitionByRange(parts, col(xCol).desc)
      .sortWithinPartitions(col(xCol).desc)
      .withColumn("_pid", shiftright(monotonically_increasing_id(), 33).cast("int"))
      .localCheckpoint(true)
    val partMax = sorted.groupBy(col("_pid"))
      .agg(max(col("_myd")).as("_pm"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // exclusive prefix max of the larger-x partitions (driver fold over
    // ≤ parts values; -inf = "nothing precedes", matching the old
    // null-running-max semantics for finite y)
    val pref = new Array[Double](parts)
    var run = Double.NegativeInfinity
    var p = 0
    while (p < parts) {
      pref(p) = run
      run = math.max(run, partMax.getOrElse(p, Double.NegativeInfinity))
      p += 1
    }
    val wv = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pid"))
      .orderBy(col(xCol).desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val prefCol = element_at(typedLit(pref.toSeq), col("_pid") + 1)
    val frontier = sorted
      .withColumn("_rm",
        greatest(coalesce(max(col("_myd")).over(wv),
          lit(Double.NegativeInfinity)), prefCol))
      .where(col("_myd") > col("_rm"))
      .select(col(xCol), col("_my"))
    df.join(broadcast(frontier), Seq(xCol))
      .where(col(yCol) === col("_my"))
      .select(col(idCol), col(xCol), col(yCol))
      .orderBy(col(idCol))
  }
}
