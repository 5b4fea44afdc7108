package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document deduplication operators for the LLM-pipeline surface
  * (BASELINE.json north star): exact hash dedup, MinHash+LSH near-dup,
  * SimHash near-dup, and n-gram Jaccard verification.
  *
  * Scale design: every stage is a grouped/joined DataFrame op —
  * signatures and band buckets are map-side column expressions; candidate
  * generation is an equi-join on band buckets (shuffle bounded by bucket
  * cardinality, the LSH guarantee), never an all-pairs cross join. At
  * 100 TB the only all-to-all structure is the bucket join, which AQE
  * skew-splits if a bucket is hot.
  */
object Dedup {

  /** Exact dedup: md5 content hash; canonical row = min doc_id per hash
    * group; `is_dup` marks redundant rows. */
  def exactDedup(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
  }

  /** MinHash signature: H independent hash functions realized as
    * md5("<h>:" + shingle); the signature entry is the lexicographic min
    * hex digest over the doc's shingle set (a valid min-hash family, and
    * engine-portable — no integer hashing required). Computed by the
    * fused one-pass expression (graft.plans.MinHashSignature),
    * value-identical to [[minhashSignatureHof]] (parity-tested).
    *
    * Cost attribution (graft.MinhashStages, SCALE.md): on a
    * low-boilerplate corpus this signature pass is ~82 % of the whole
    * LSH pipeline at 500k docs — it is the row-linear term. At corpus
    * scale use [[minhashSignatureFast]] (fused xxhash64 family —
    * measured 5.7× cheaper at 500k docs, identical verified output
    * there) or lower numHashes; md5 is kept here for DuckDB-oracle
    * bit-parity. */
  def minhashSignature(docs: DataFrame, shingleN: Int, numHashes: Int,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    // the numHashes×md5-per-shingle fold is the row-linear map cost
    // (82 % of the pipeline at 500k docs); spread a single-split scan
    // across the cores first (identity at scale)
    ScanSpread.spreadSmall(docs).select(
      col("doc_id"),
      TextFunctions.wordShingles(col(textCol), shingleN).as("shingles"))
      .withColumn("sig", ColumnBridge.column(graft.plans.MinHashSignature(
        ColumnBridge.expression(col("shingles")), numHashes)))
  }

  /** HOF reference form of [[minhashSignature]] (parity-tested; mirrors
    * the q_minhash_lsh DuckDB oracle SQL shape). */
  def minhashSignatureHof(docs: DataFrame, shingleN: Int, numHashes: Int,
      textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      TextFunctions.wordShingles(col(textCol), shingleN).as("shingles"))
      .withColumn("sig",
        transform(sequence(lit(0), lit(numHashes - 1), lit(1)), h =>
          array_min(transform(col("shingles"), sh =>
            md5(concat(h.cast("string"), lit(":"), sh))))))

  /** The shared banding shape of both LSH families: explode each
    * signature into (band, bucket) rows, self-join on (band, bucket),
    * keep doc_a < doc_b, distinct. Only the bucket expression differs
    * per family — `bucketFn(band, sigSlice)` (the band index is ALSO a
    * join key, so a bucketFn may ignore it). */
  private def bandedCandidates(sigs: DataFrame, bands: Int, rowsPerBand: Int,
      bucketFn: (Column, Column) => Column): DataFrame = {
    val banded = sigs.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1), lit(1)), b =>
        struct(b.as("band"),
          bucketFn(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))
            .as("bucket")))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** LSH banding: band b's bucket is md5 of the joined signature slice.
    * Docs sharing any band bucket become candidate pairs (doc_a < doc_b). */
  def lshCandidates(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    bandedCandidates(sigs, bands, rowsPerBand,
      (_, sl) => md5(concat_ws("|", sl)))

  /** [[lshCandidates]] for long signatures (the fast xxhash64 family):
    * band b's bucket is xxhash64(b, signature slice) — two docs
    * co-bucket iff their band slices are equal (modulo 64-bit hash
    * collisions, as md5-of-joined-hex is modulo 128-bit ones), so the
    * candidate set matches the string form's in practice. The join key
    * is 8 bytes instead of a 32-char md5 hex and the per-row
    * stringify+md5 pass is gone — at corpus scale the banding exchange
    * shuffles ~4× fewer key bytes. */
  def lshCandidatesFast(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    bandedCandidates(sigs, bands, rowsPerBand,
      (b, sl) => xxhash64(b, sl))

  /** Exact Jaccard similarity of two shingle-array columns — fused
    * one-pass expression (graft.plans.JaccardSim), value-identical to
    * size(array_intersect)/size(array_union). */
  def jaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.JaccardSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** HOF reference form of [[jaccard]] (parity-tested). */
  def jaccardHof(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Full MinHash+LSH near-dup pipeline: signature → banded candidates →
    * signature-estimated Jaccard → exact shingle-Jaccard verification,
    * keeping pairs with exact Jaccard ≥ threshold. */
  def minhashLshDups(
      docs: DataFrame,
      shingleN: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.8,
      textCol: String = "text"): DataFrame = {
    val rowsPerBand = numHashes / bands
    // materialized once (eager localCheckpoint): the signature table feeds
    // candidate generation and both sides of the scoring join — without it
    // the 16×md5 signature is recomputed three times. Checkpoint blocks
    // are GC'd with the result (ContextCleaner), unlike persist() entries
    // which leak in the CacheManager until an explicit unpersist.
    val sigs = minhashSignature(docs, shingleN, numHashes, textCol).localCheckpoint(true)
    val pairs = lshCandidates(sigs, bands, rowsPerBand)
    verifyCandidates(sigs, pairs, numHashes, threshold)
  }

  /** The shared scoring tail of the LSH pipelines: join candidates back
    * to the signature table, estimate Jaccard from signature agreement,
    * verify with the exact shingle Jaccard, threshold. Signature element
    * type is irrelevant — agreement is plain equality (md5 hex strings
    * and xxhash64 longs alike). Package-visible so the stage-attribution
    * harness (graft.MinhashStages) times THIS function, not an inline
    * re-implementation that could drift (ADVICE r11). */
  private[graft] def verifyCandidates(sigs: DataFrame, pairs: DataFrame,
      numHashes: Int, threshold: Double): DataFrame = {
    val a = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
      col("shingles").as("sh_a"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
      col("shingles").as("sh_b"))
    pairs.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .select(
        col("doc_a"), col("doc_b"),
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          m => m)).cast("double") / numHashes, 4).as("est_jaccard"),
        round(jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The corpus-scale FAST family: xxhash64(h, shingle) minimum instead
    * of 16 md5 hex digests per shingle — the knob the measured 100×
    * stage split points at (signature compute = 82 % of pipeline cost;
    * graft.MinhashStages, SCALE.md). An equally valid min-hash family
    * (any hash indexed by h works); values differ from the md5 family,
    * so band buckets — and therefore the CANDIDATE set — can differ on
    * true near-dups (j < 1 pairs co-bucket probabilistically), which is
    * why this form is spec-gated on verified-output recall against the
    * md5 pipeline rather than DuckDB-oracled (DuckDB has no xxhash64).
    * The verify stage is the same exact-Jaccard threshold, so every
    * emitted pair is a true near-dup regardless of family. */
  def minhashSignatureFast(docs: DataFrame, shingleN: Int, numHashes: Int,
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    ScanSpread.spreadSmall(docs).select(
      col("doc_id"),
      TextFunctions.wordShingles(col(textCol), shingleN).as("shingles"))
      .withColumn("sig", ColumnBridge.column(graft.plans.MinHashSignatureFast(
        ColumnBridge.expression(col("shingles")), numHashes)))
  }

  /** HOF reference form of [[minhashSignatureFast]] (parity-tested;
    * defines the family as Spark's own xxhash64(h, shingle)). */
  def minhashSignatureFastHof(docs: DataFrame, shingleN: Int, numHashes: Int,
      textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      TextFunctions.wordShingles(col(textCol), shingleN).as("shingles"))
      .withColumn("sig",
        transform(sequence(lit(0), lit(numHashes - 1), lit(1)), h =>
          array_min(transform(col("shingles"), sh => xxhash64(h, sh)))))

  /** Signature-agreement scoring of a candidate pair table: join pairs
    * back to the signature table, emit (doc_a, doc_b, est_jaccard).
    * The xxhash64-dependent half of the fast pipeline's scoring. */
  private[graft] def scoreCandidates(sigs: DataFrame, pairs: DataFrame,
      numHashes: Int): DataFrame = {
    val a = sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    pairs.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          m => m)).cast("double") / numHashes, 4).as("est_jaccard"))
  }

  /** The fast family's banded candidate pairs WITH their signature
    * est_jaccard — everything in the pipeline that depends on xxhash64
    * (which has no DuckDB analog), split out so the driver contract can
    * store it as an input artifact (q_minhash_fast_cands) and give the
    * remaining verify stage a full SQL oracle.
    *
    * Since r14 the generation ADAPTIVELY COLLAPSES VERBATIM REPLICAS
    * before banding (r13 verdict item 2): on a dup-heavy corpus the
    * direct band join is quadratic in verbatim-cloud size — byte-
    * identical texts band, co-bucket and pair redundantly, because
    * signatures and band buckets are pure functions of the text — so
    * one representative per distinct text goes through the band join
    * and the emitted pair set is recovered by closure
    * ([[collapsedScoredCandidates]]), IDENTICAL to direct banding
    * row-for-row (the sf0.001/sf0.01 drift pins and the equality spec
    * hold over the change; the proof is that co-bucketing, est_jaccard
    * and exact Jaccard are all class properties of the exact-duplicate
    * groups). Mostly-unique corpora and small-cloud corpora keep the
    * pre-r14 direct plan (the two-gate switch on
    * [[collapsedScoredCandidates]]): there the collapse machinery is
    * measured overhead with nothing to collapse. On a boilerplate-heavy
    * crawl corpus at 100 TB this makes band-join cost quadratic in
    * DISTINCT-cloud size, not cloud size. The reference's dedup has no
    * analog (its corpus is vectors); the discipline is the engine's own
    * exactDedup-before-LSH guidance (SCALE.md round 13), made code. */
  def minhashFastCandidatesScored(
      docs: DataFrame,
      shingleN: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      textCol: String = "text"): DataFrame =
    collapsedScoredCandidates(
      minhashCollapsedSigs(docs, shingleN, numHashes, textCol),
      numHashes, bands)

  /** Stage 1 of the collapsed generation (package-visible so the
    * MinhashStages harness times the PRODUCTION stage): one map pass
    * over the corpus emitting (doc_id, ghash = md5(text), sig) —
    * signature via the fused xxhash64 expression, the md5 group hash
    * for the verbatim-replica collapse. No shingle column is
    * materialized (scoring never needs it; verify recomputes shingles
    * candidate-bounded), so this checkpoint is SMALLER than the
    * pre-r14 (doc_id, shingles, sig) one. */
  private[graft] def minhashCollapsedSigs(docs: DataFrame, shingleN: Int,
      numHashes: Int, textCol: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    ScanSpread.spreadSmall(docs).select(
      col("doc_id"),
      md5(col(textCol)).as("ghash"),
      ColumnBridge.column(graft.plans.MinHashSignatureFast(
        ColumnBridge.expression(TextFunctions.wordShingles(col(textCol), shingleN)),
        numHashes)).as("sig"))
      .localCheckpoint(true)
  }

  /** The collapse regime switch, two measured gates (the PruneSkipRatio
    * / FilteredSearchPlanner crossover discipline; both branches emit
    * identical rows, so the switch can never change a result):
    *
    *   1. distinct/rows > [[CollapseSkipDistinctRatio]] → DIRECT with
    *      no further work: a mostly-unique corpus has nothing to
    *      collapse, and the reps aggregate alone is measured overhead
    *      (+18 % band stage on the 5M-doc shuffled-unique fixture).
    *      One approx_count_distinct pass over the checkpoint.
    *   2. size-biased mean group size Σg²/n < [[CollapseMinCloud]] →
    *      DIRECT: the quadratic term the collapse removes is the
    *      within-bucket g² band volume, and below ~modest clouds the
    *      direct join's g² rows through ONE in-memory join beat the
    *      collapse's extra shuffles (measured: verbatim clouds of 51 →
    *      direct band 7.0 s vs collapsed 9.2 s at 500k docs; clouds of
    *      300 → direct's pre-distinct volume is 1.8 B rows and the
    *      collapse wins outright). Needs the group-size aggregate —
    *      which IS the collapse's reps table, so a dup-heavy corpus
    *      that still lands direct has paid one group-count aggregate,
    *      bounded by the band join it avoided mis-sizing. */
  private val CollapseSkipDistinctRatio = 0.9
  private val CollapseMinCloud = 64.0

  /** Stage 2: regime-switched candidate generation. Boilerplate-heavy
    * corpora go representatives → band join → closure expansion;
    * mostly-unique or small-cloud corpora band every doc directly (the
    * pre-r14 plan). The collapsed branch's output is identical to
    * direct banding, because signatures (and so band buckets) are
    * functions of the text: a pair (a, b) is a direct-banding candidate
    * iff their groups' representatives co-bucket (cross-group) or
    * a = b's group (within-group — identical sigs co-bucket in EVERY
    * band), and est_jaccard is constant on each group pair.
    * Within-group pairs carry the rep sig's self-agreement (1.0, except
    * 0 for empty-shingle docs whose sig positions are all null —
    * exactly what direct scoring yields on those pairs).
    *
    * `forceCollapse` pins the branch (specs pin row identity of both;
    * the MinhashStages A/B pins one per run); None = the two-gate
    * adaptive decision. */
  private[graft] def collapsedScoredCandidates(sigsAll: DataFrame,
      numHashes: Int, bands: Int,
      forceCollapse: Option[Boolean] = None): DataFrame = {
    val rowsPerBand = numHashes / bands
    def direct(): DataFrame = scoreCandidates(sigsAll,
      lshCandidatesFast(sigsAll, bands, rowsPerBand), numHashes)
    if (forceCollapse.contains(false)) return direct()
    if (forceCollapse.isEmpty) {
      val r = sigsAll.agg(count(lit(1)).as("n"),
        approx_count_distinct(col("ghash")).as("d")).head()
      val (nRows, nDistinct) = (r.getLong(0), r.getLong(1))
      if (nRows == 0 || nDistinct.toDouble / nRows > CollapseSkipDistinctRatio)
        return direct()
    }
    // one row per distinct text: min doc_id + the group's (identical)
    // signature and size — a (ghash, id, sig) shuffle, NOT a full-text
    // shuffle
    val reps = sigsAll.groupBy(col("ghash"))
      .agg(min(col("doc_id")).as("doc_id"),
        min_by(col("sig"), col("doc_id")).as("sig"),
        count(lit(1)).as("gsize"))
      .localCheckpoint(true)
    if (forceCollapse.isEmpty) {
      val sb = reps.agg(sum(col("gsize") * col("gsize")).as("sq"),
        sum(col("gsize")).as("n")).head()
      if (sb.getLong(0).toDouble / sb.getLong(1) < CollapseMinCloud)
        return direct()
    }
    val repSigs = reps.select(col("doc_id"), col("sig"))
    val repPairs = lshCandidatesFast(repSigs, bands, rowsPerBand)
    val scoredReps = scoreCandidates(repSigs, repPairs, numHashes)
    val members = sigsAll.select(col("ghash"), col("doc_id"))
    val repOf = reps.select(col("ghash"), col("doc_id").as("rep_id"))
    // cross-group closure: every member pair of a candidate rep pair,
    // re-oriented doc_a < doc_b (member ids interleave across groups)
    val cross = scoredReps
      .join(repOf.select(col("rep_id").as("doc_a"), col("ghash").as("gh_a")),
        Seq("doc_a"))
      .join(repOf.select(col("rep_id").as("doc_b"), col("ghash").as("gh_b")),
        Seq("doc_b"))
      .join(members.select(col("ghash").as("gh_a"), col("doc_id").as("id_a")),
        Seq("gh_a"))
      .join(members.select(col("ghash").as("gh_b"), col("doc_id").as("id_b")),
        Seq("gh_b"))
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"),
        col("est_jaccard"))
    // within-group closure: per-group member self-join (doc_a < doc_b) —
    // the only place group size enters quadratically, and those pairs
    // ARE the required output
    val selfEst = reps.select(col("ghash"),
      round(size(filter(zip_with(col("sig"), col("sig"), (x, y) => x === y),
        m => m)).cast("double") / numHashes, 4).as("est_jaccard"))
    val within = members.as("x")
      .join(members.as("y"),
        col("x.ghash") === col("y.ghash") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.ghash").as("ghash"), col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"))
      .join(selfEst, Seq("ghash"))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
    cross.unionByName(within)
  }

  /** The pre-r14 DIRECT generation — every doc through the band join.
    * Kept as the reference form for the collapse-equality spec (the
    * same role the HOF signature forms play for the fused
    * expressions). */
  private[graft] def minhashFastCandidatesScoredDirect(
      docs: DataFrame,
      shingleN: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      textCol: String = "text"): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sigs = minhashSignatureFast(docs, shingleN, numHashes, textCol)
      .localCheckpoint(true)
    val pairs = lshCandidatesFast(sigs, bands, rowsPerBand)
    scoreCandidates(sigs, pairs, numHashes)
  }

  /** The family-neutral verify tail given SCORED candidates: exact
    * shingle-Jaccard threshold over the pair table — pure relational
    * SQL given (doc_a, doc_b, est_jaccard), which is exactly how the
    * DuckDB oracle replays it from the stored candidate artifact.
    * Docs are semi-join pruned to the ids that appear in a candidate
    * pair BEFORE shingling ([[candidateShingles]]), making the shingle
    * recompute genuinely O(candidates): without the prune, joining the
    * full shingled corpus on each side costs two corpus-wide
    * `wordShingles` passes — measured 34.6 s of a ~68 s pipeline at
    * 500k docs vs 3.4 s pruned (graft.MinhashStages, SCALE.md
    * round-12, honest re-measure round-13).
    *
    * This is a LAZY transformation (no jobs until an action) — ADVICE
    * r12. `scored` appears three times in the plan (the two id-set
    * projections and the final join) and the pruned shingle subtree
    * twice (the sh_a / sh_b sides): both are candidate-bounded, so the
    * duplicate work is small; a caller whose `scored` subtree is
    * expensive to recompute (the banding pipeline) should checkpoint it
    * first, as [[minhashLshDupsFast]] does. */
  def verifyScoredCandidates(
      docs: DataFrame,
      scored: DataFrame,
      shingleN: Int = 3,
      threshold: Double = 0.8,
      textCol: String = "text"): DataFrame = {
    // Verbatim-pair fast path (r15, guide §2.3 "shuffle keys and
    // metadata instead of payloads"): a candidate pair of BYTE-IDENTICAL
    // texts with a non-empty shingle set has exact Jaccard 1.0 by
    // identity — n/n of the same sorted array — so shingling both sides
    // and intersecting identical arrays proves nothing. On a
    // boilerplate-heavy corpus ~every candidate pair is within a
    // verbatim cloud (measured 62.46M of 62.47M pairs at 300×-docs /
    // 0.5-verbatim; verify was 325 s of a 367 s pipeline), so pairs are
    // first tagged with a per-doc md5 group hash + a has-shingles flag
    // (one tokenize-count pass over the candidate-pruned docs — no
    // shingling): equal-hash pairs with shingles score exactly
    // round(1.0, 4) = 1.0, the value the exact path computes for them;
    // everything else — including the empty-shingle edge, whose exact
    // path yields a non-comparable null — keeps the full
    // shingle-intersection verify, now pruned to the non-verbatim ids.
    val candIds = scored.select(col("doc_a").as("doc_id"))
      .unionByName(scored.select(col("doc_b").as("doc_id")))
      .distinct()
    val meta = docs.join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), md5(col(textCol)).as("gh"),
        (size(TextFunctions.tokens(col(textCol))) >= shingleN).as("has_sh"))
    val tagged = scored
      .join(meta.select(col("doc_id").as("doc_a"), col("gh").as("gh_a"),
        col("has_sh").as("has_a")), Seq("doc_a"))
      .join(meta.select(col("doc_id").as("doc_b"), col("gh").as("gh_b")),
        Seq("doc_b"))
    val isVerbatim = col("gh_a") === col("gh_b") && col("has_a")
    val verbatim = tagged.where(isVerbatim)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        lit(1.0d).as("jaccard"))
      .where(col("jaccard") >= threshold)
    val rest = tagged.where(!isVerbatim)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
    val sh = candidateShingles(docs, rest, shingleN, textCol)
    val exact = rest
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        round(jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
    exact.unionByName(verbatim)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The semi-join-pruned shingle table verify consumes: docs restricted
    * to ids appearing in a candidate pair BEFORE shingling, so the
    * shingle recompute is O(candidates), not O(corpus). No broadcast
    * hint: AQE picks broadcast while the candidate id set is small and
    * degrades to a shuffle semi join when it isn't (a driver-side
    * broadcast of a corpus-linear id set would not survive 100-TB
    * candidate volumes). Package-visible so DedupSpec plan-gates the
    * LeftSemi-below-shingling ordering on this helper in isolation as
    * well as on the full verify plan. */
  private[graft] def candidateShingles(docs: DataFrame, scored: DataFrame,
      shingleN: Int, textCol: String): DataFrame = {
    val candIds = scored.select(col("doc_a").as("doc_id"))
      .unionByName(scored.select(col("doc_b").as("doc_id")))
      .distinct()
    docs.join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        TextFunctions.wordShingles(col(textCol), shingleN).as("sh"))
  }

  /** [[minhashLshDups]] over the fast xxhash64 family — same banding,
    * same exact-Jaccard verification; measured at 500k docs with
    * production calls (graft.MinhashStages, r12): signature 91.1 →
    * 16.6 s (~5×), verify 34.6 → 3.4 s (semi-join pruned — r13 honest
    * re-measure with the whole lazy verify inside the stage clock),
    * whole pipeline ~112 → ~26 s, identical 257 verified dup pairs.
    * Composed from the two driver-contract halves; output identical to
    * the former fused form (same est from the same sigs, same exact
    * Jaccard from the same deterministic shingles). */
  def minhashLshDupsFast(
      docs: DataFrame,
      shingleN: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.8,
      textCol: String = "text"): DataFrame = {
    // the scored table feeds verify's final join AND its semi-join id
    // prune (3 plan references) — checkpoint HERE, where the subtree
    // being saved (the banding pipeline) lives, so verifyScoredCandidates
    // itself stays a lazy transformation (ADVICE r12); pair tables are
    // bucket-bounded, so the materialization is small
    val scored = minhashFastCandidatesScored(docs, shingleN, numHashes, bands, textCol)
      .localCheckpoint(true)
    verifyScoredCandidates(docs, scored, shingleN, threshold, textCol)
  }

  /** Group near-dup pairs into clusters: iterative min-label propagation
    * over the (undirected) pair graph — every doc converges to the
    * smallest doc_id reachable from it; that id is the cluster canonical.
    * Dup clusters have tiny diameter, so this converges in a handful of
    * rounds; each round is one join + one aggregation (the standard
    * scalable connected-components shape). Docs in no pair keep
    * themselves as canonical. */
  def dupClusters(docs: DataFrame, pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // localCheckpoint truncates the lineage each round — the plan would
    // otherwise reference the previous labels twice per iteration and
    // grow exponentially (analyzer OOM by ~10 rounds)
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    var labels = docs.select(col("doc_id"), col("doc_id").as("canonical_id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val nbrMin = edges.join(labels, edges("src") === labels("doc_id"))
        .groupBy(col("dst")).agg(min(col("canonical_id")).as("nbr_min"))
      // the change count rides INSIDE the checkpoint job as an observed
      // metric (CollectMetrics): one job per round total — no second
      // count() pass, not even a narrow one over the cached blocks
      val metricName = s"dup_cluster_conv_$iter"
      val flagged = labels.as("l")
        .join(nbrMin, col("l.doc_id") === nbrMin("dst"), "left")
        .select(col("l.doc_id").as("doc_id"),
          least(col("l.canonical_id"),
            coalesce(col("nbr_min"), col("l.canonical_id"))).as("canonical_id"),
          (coalesce(col("nbr_min"), col("l.canonical_id")) < col("l.canonical_id"))
            .as("changed"))
        .observe(metricName, sum(col("changed").cast("long")).as("changes"))
      val updated = flagged.localCheckpoint(true)
      val changes = flagged.queryExecution.observedMetrics.get(metricName)
        .map(r => Option(r.getAs[java.lang.Long]("changes")).map(_.toLong).getOrElse(0L))
        .getOrElse(sys.error(s"observed metric $metricName missing"))
      labels = updated.drop("changed")
      converged = changes == 0
      iter += 1
    }
    labels.withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
  }

  /** Exact duplicated-substring spans across documents — the ExactSubstr
    * operator of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better" (ACL 2022): every MAXIMAL token span of length ≥
    * `minTokens` shared verbatim by two documents, with its position in
    * both. [[graft.operators.CorpusStats.dupNgramStats]] reports the
    * duplicated-gram FRACTION per doc; this reports the spans themselves,
    * so a curation pipeline can cut the redundant copy.
    *
    * Construction: seeds are k-token grams (k = minTokens). A shared
    * span of length L ≥ k produces exactly L−k+1 consecutive seed
    * matches on one (doc_a, doc_b, pos_a−pos_b) diagonal, so maximal
    * spans = maximal runs of consecutive seeds per diagonal — island
    * detection over a window, after ONE equi-join on the gram.
    *
    * Scale: the join is gram-keyed (inverted-index fan-out — singleton
    * grams never join; no all-pairs stage); the diagonal window
    * partitions by (doc_a, doc_b, diag), so partition size is one span's
    * seed count, never the corpus. The paper's suffix array finds the
    * same spans on one machine; this form trades CPU for shuffle-bounded
    * parallelism. At corpus scale, join on `xxhash64(gram)` to shrink
    * shuffle bytes (kept as the raw string here for DuckDB-oracle
    * parity). `maxGramDocFreq` > 0 enables the boilerplate spam cap:
    * grams appearing in more than that many documents (headers, license
    * blocks, template chrome — the join-fan-out pathology, since a gram
    * in F docs seeds F² pairs) are dropped before the self-join via an
    * anti-join against the (small) hot-gram set. Spans supported ONLY by
    * capped grams disappear; spans with any sub-span of rarer grams
    * survive, possibly split. Off by default — capping changes
    * semantics, so the oracle-matched path runs uncapped.
    *
    * Output: (doc_a, doc_b, start_a, start_b, len_tokens), doc_a < doc_b,
    * 0-based token offsets. */
  def duplicateSpans(
      docs: DataFrame,
      minTokens: Int = 8,
      textCol: String = "text",
      maxGramDocFreq: Int = 0): DataFrame = {
    val k = minTokens
    val grams = spanGrams(docs, k, textCol, maxGramDocFreq)
    val seeds = grams.select(col("doc_id").as("doc_a"), col("pos").as("pos_a"), col("gram"))
      .join(grams.select(col("doc_id").as("doc_b"), col("pos").as("pos_b"), col("gram")),
        Seq("gram"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pos_a"), col("pos_b"),
        (col("pos_a") - col("pos_b")).as("diag"))
    val wD = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pos_a"))
    seeds
      .withColumn("brk",
        when(col("pos_a") - lag(col("pos_a"), 1).over(wD) === 1, 0L).otherwise(1L))
      .withColumn("island",
        sum(col("brk")).over(wD.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("island"))
      .agg(min(col("pos_a")).as("start_a"),
        (max(col("pos_a")) - min(col("pos_a")) + k).cast("long").as("len_tokens"))
      .select(col("doc_a"), col("doc_b"),
        col("start_a").cast("long").as("start_a"),
        (col("start_a") - col("diag")).cast("long").as("start_b"),
        col("len_tokens"))
  }

  /** Shared gram stage of [[duplicateSpans]]: (doc_id, pos, gram) k-gram
    * postings, with the optional hot-gram doc-frequency cap applied. */
  private def spanGrams(
      docs: DataFrame,
      k: Int,
      textCol: String,
      maxGramDocFreq: Int): DataFrame = {
    val toks = docs.select(col("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) >= k)
    val gramsAll = toks.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), size(col("toks")) - k),
        i => array_join(slice(col("toks"), i + 1, lit(k)), " "))))
      .toDF("doc_id", "pos", "gram")
    if (maxGramDocFreq <= 0) gramsAll
    else {
      // ONE evaluation of the tokenize+explode: uncheckpointed, the
      // doc-frequency pre-pass and the anti-join left side would each
      // re-run it (the cap's pre-pass then costs more than it saves —
      // the r6 bench measured the double scan at 2× the uncapped
      // query). localCheckpoint spills MEMORY_AND_DISK, so at corpus
      // scale this trades one posting-table materialization (~k×
      // corpus tokens, disk-backed, partition-local) against a second
      // full tokenize pass — the same single-evaluation discipline as
      // crossNll's count table.
      val posted = gramsAll.localCheckpoint(true)
      val hot = posted.groupBy(col("gram"))
        .agg(countDistinct(col("doc_id")).as("df"))
        .where(col("df") > maxGramDocFreq)
        .select(col("gram"))
      posted.join(hot, Seq("gram"), "left_anti")
    }
  }

  /** Audit for the maxGramDocFreq cap: the candidate volume the
    * self-join would materialize — Σ over grams of pairs(df) — plus
    * posting/gram counts, WITHOUT running the join (the sums come off
    * one grouped aggregate of the posting table, so the uncapped number
    * is measurable even where the uncapped join itself would be the F²
    * pathology). One row: (num_postings, num_grams, num_candidate_pairs).
    * SCALE.md records capped-vs-uncapped numbers from this at bench
    * scale. */
  def spanCandidateStats(
      docs: DataFrame,
      minTokens: Int = 8,
      textCol: String = "text",
      maxGramDocFreq: Int = 0): DataFrame = {
    // per-gram per-doc posting counts c_i: a gram contributes
    // Σ_{i<j} c_i·c_j = (S² − Σc_i²)/2 candidate pairs (doc_a < doc_b).
    // The pair arithmetic runs in DECIMAL(38,0): a hot gram with S past
    // ~3×10⁹ postings would wrap S² in long math, and a double `/2`
    // loses exactness past 2⁵³ — i.e. the audit would lie precisely in
    // the F² pathology it exists to measure. 38 digits cover S ≤ 10¹⁹.
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    spanGrams(docs, minTokens, textCol, maxGramDocFreq)
      .groupBy(col("gram"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("gram"))
      .agg(sum(col("c")).as("s"), sum(col("c").cast(dec) * col("c")).as("sq"),
        count(lit(1)).as("df"))
      .agg(
        sum(col("s")).cast("long").as("num_postings"),
        count(lit(1)).cast("long").as("num_grams"),
        ((sum(col("s").cast(dec) * col("s")) - sum(col("sq"))) / 2)
          .cast(dec).as("num_candidate_pairs"))
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
    * — the MOSS algorithm): hash every k-gram, slide a window of w
    * consecutive hashes, and in each window select the minimum hash
    * (RIGHTMOST position on ties — the paper's robust-winnowing rule).
    * Guarantees: any shared substring of ≥ w+k−1 tokens yields at least
    * one shared fingerprint, and selection density is ~2/(w+1) — the
    * local fingerprinting scheme plagiarism/overlap detection is built
    * on, positional where the MinHash sketch is global.
    *
    * Shape: ONE sliding per-doc window pass (rows-bounded frame of
    * exactly w grams) computing `min(struct(h, -pos))` — struct
    * ordering compares h first, then -pos, so the minimum IS
    * (window-min hash, rightmost tying position) in a single
    * aggregate. No explode, no join, no groupBy: selection costs the
    * same shuffle the window already pays. Portable md5-derived
    * 32-bit hashes keep the whole thing DuckDB-replayable. Output:
    * (doc_id, fp_pos, fp_hash) distinct, ordered. */
  def winnowFingerprints(
      docs: DataFrame,
      k: Int = 4,
      w: Int = 4,
      textCol: String = "text"): DataFrame =
    winnowSelections(docs, k, w, textCol)
      .select(col("doc_id"),
        (-col("sel.negpos")).cast("long").as("fp_pos"),
        col("sel.h").as("fp_hash"))
      .distinct()
      .orderBy(col("doc_id"), col("fp_pos"), col("fp_hash"))

  /** The raw (pre-distinct, unordered) winnowing selection stream —
    * one row per full window, `sel = (h, -pos)` the robust-winnowing
    * pick. Shared by [[winnowFingerprints]] (which distincts on
    * (doc_id, pos, hash) and orders — its declared output) and
    * [[winnowDups]] (which only needs distinct (doc_id, hash): going
    * through the fingerprint form paid an extra hash aggregate plus
    * the global sort, both discarded by the join — r15, guide §2.4). */
  private def winnowSelections(
      docs: DataFrame,
      k: Int,
      w: Int,
      textCol: String): DataFrame = {
    // tokenize + 4-gram join + md5 are the heavy map work and run
    // BEFORE the window's doc_id exchange — on one task when the
    // corpus is one parquet split. Spread small scans first (r15,
    // guide §2.5); identity once splits ≥ cores.
    val toks = ScanSpread.spreadSmall(docs)
      .select(col("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) >= k + w - 1)
    val grams = toks.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), size(col("toks")) - k),
        i => array_join(slice(col("toks"), i + 1, lit(k)), " "))))
      .toDF("doc_id", "pos", "gram")
      .select(col("doc_id"), col("pos"),
        conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long").as("h"))
    // ONE window pass: the same sliding frame yields the selection AND
    // the row count — a frame of exactly w rows ⟺ a full window (the
    // pos ≤ n−w test without a second, full-partition window). The
    // min-struct trick replaces the former O(n·w) explode + equi-join
    // + groupBy: min(struct(h, -pos)) is lexicographic, so it selects
    // the minimum hash and, among ties, the LARGEST pos — exactly the
    // robust-winnowing rightmost-tie rule — inside the frame the pass
    // already runs.
    val wSlide = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("sel",
        min(struct(col("h").as("h"), (-col("pos")).as("negpos"))).over(wSlide))
      .withColumn("wlen", count(lit(1)).over(wSlide))
      .where(col("wlen") === w) // full windows only
  }

  /** Winnowing overlap pairs — MOSS's actual use of the fingerprints:
    * doc pairs sharing ≥ `minShared` DISTINCT fingerprint hashes, with
    * the shared count (the plagiarism/near-dup ranking signal). The
    * candidate join is an equi-join on fp_hash — fan-out bounded by
    * fingerprint collision groups (the winnowing guarantee makes any
    * ≥ w+k−1-token shared run produce a collision, so recall is
    * structural, not probabilistic). Output: (doc_a, doc_b, shared_fps)
    * ordered. */
  def winnowDups(
      docs: DataFrame,
      k: Int = 4,
      w: Int = 4,
      minShared: Int = 2,
      textCol: String = "text"): DataFrame = {
    // distinct straight to (doc_id, fp_hash) off the raw selection
    // stream: a fingerprint set projected to (doc, hash) and distincted
    // equals the (doc, hash)-distinct of the raw stream (the dropped
    // fp_pos only ever ADDED rows), and the window's doc_id partitioning
    // satisfies the grouping, so the whole candidate side runs on one
    // exchange — the fingerprint form re-aggregated and globally sorted
    // first, both discarded by this join (r15, guide §2.4).
    val fps = winnowSelections(docs, k, w, textCol)
      .select(col("doc_id"), col("sel.h").as("fp_hash")).distinct()
    fps.select(col("doc_id").as("doc_a"), col("fp_hash"))
      .join(fps.select(col("doc_id").as("doc_b"), col("fp_hash")), Seq("fp_hash"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .where(col("shared_fps") >= minShared)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** The removal half of ExactSubstr dedup (Lee et al. 2022 cut ONE copy
    * of each duplicated span and showed the model improves): given
    * [[duplicateSpans]] output, delete the span tokens from the LATER
    * document of each pair (keep-first policy — the earlier doc_id keeps
    * its text intact) and return the cleaned corpus.
    *
    * Shape: per-doc span intervals merge under a window (intervals per
    * doc are few — span count, not token count), ride as one small array
    * column into a LEFT join, and the cut itself is a map-side
    * index-filter lambda over the token array — no shuffle of the corpus
    * beyond the one join, whose right side is span-bounded. Output text
    * is whitespace-normalized (rebuilt from tokens) so cut and uncut
    * docs share one canonical form. */
  def cutSpans(
      docs: DataFrame,
      spans: DataFrame,
      textCol: String = "text"): DataFrame = {
    // cut side: doc_b intervals [start_b, start_b + len)
    val ivs = spans.select(col("doc_b").as("doc_id"), col("start_b").as("s"),
      (col("start_b") + col("len_tokens")).as("e"))
    // merge overlapping/adjacent intervals per doc: new group when this
    // start passes every previous end
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = ivs
      .withColumn("prev_max", max(col("e")).over(wPrev))
      .withColumn("ng", when(col("prev_max").isNull || col("s") > col("prev_max"), 1L)
        .otherwise(0L))
      .withColumn("grp", sum(col("ng")).over(wRun))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("ivs"))
    docs.select(col("doc_id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .join(merged, Seq("doc_id"), "left")
      .withColumn("kept",
        when(col("ivs").isNull, col("toks")).otherwise(
          filter(col("toks"), (_, i) =>
            !exists(col("ivs"), iv =>
              i.cast("long") >= iv.getField("s") && i.cast("long") < iv.getField("e")))))
      .select(col("doc_id"),
        array_join(col("kept"), " ").as("clean_text"),
        (size(col("toks")) - size(col("kept"))).cast("long").as("removed_tokens"))
  }

  /** N-gram Jaccard near-dup with attribute blocking and PPJoin-style
    * prefix filtering — the non-LSH verification path, exact.
    *
    * Candidate generation: order each doc's distinct shingles by a global
    * total order (plain lexicographic — any consistent order satisfies
    * the prefix theorem, and sorting is free where a frequency pass or
    * per-shingle hashing is not) and keep only the first
    * `|X| − ⌈t·|X|⌉ + 1` as the prefix. If jaccard(A,B) ≥ t then
    * |A∩B| ≥ ⌈t·max(|A|,|B|)⌉, and the order-minimal common shingle
    * must land in BOTH prefixes (else the ≥⌈t·|X|⌉ intersection
    * elements would all sit among the ⌈t·|X|⌉−1 suffix slots —
    * contradiction). So an equi-join on prefix shingles within the block
    * yields every qualifying pair: inverted-index-bounded fan-out instead
    * of the O(B²) all-pairs self-join, with identical output after
    * exact-Jaccard verification. */
  def ngramJaccardDups(
      docs: DataFrame,
      blockCol: String,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      textCol: String = "text"): DataFrame = {
    // sorted distinct shingles; reused by prefix explode and both
    // verification sides → materialized once (eager localCheckpoint;
    // blocks GC'd with the result, no CacheManager leak)
    val sh = ScanSpread.spreadSmall(docs)
      .select(col("doc_id"), col(blockCol).as("block"),
        array_sort(TextFunctions.wordShingles(col(textCol), shingleN)).as("sh"))
      .withColumn("plen",
        (size(col("sh")) - ceil(lit(threshold) * size(col("sh"))) + 1).cast("int"))
      .localCheckpoint(true)
    val prefixes = sh.select(col("doc_id"), col("block"),
      explode(slice(col("sh"), lit(1), col("plen"))).as("w"))
    val cands = prefixes.as("a").join(prefixes.as("b"),
        col("a.block") === col("b.block") && col("a.w") === col("b.w") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // size-bound prune on distinct sizes: jaccard ≤ min(|A|,|B|)/max(|A|,|B|)
    // — drops pairs before the set intersection without changing the result
    val sizeBound =
      least(size(col("sh_a")), size(col("sh_b"))).cast("double") /
        greatest(size(col("sh_a")), size(col("sh_b"))) >= threshold
    cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .where(sizeBound)
      .select(col("doc_a"), col("doc_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash as a 64-char bitstring (portable across engines —
    * no 64-bit unsigned arithmetic). Bit j aggregates votes from each
    * token occurrence's md5 (multiplicity-weighted — the standard
    * frequency-weighted SimHash, far more discriminative than distinct
    * tokens on shared-vocabulary corpora): hex digit j/4, bit j%4; +1 if
    * set, −1 if not; bit is 1 iff the vote is positive. */
  def simhashExpr(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.SimHash64(
      ColumnBridge.expression(TextFunctions.tokens(text))))
  }

  /** HOF reference form of [[simhashExpr]] (parity-tested; mirrors the
    * q_simhash DuckDB oracle SQL shape). */
  def simhashExprHof(text: Column): Column = {
    val hx = transform(TextFunctions.tokens(text), t => md5(t))
    val pw = typedLit(Array(1, 2, 4, 8))
    val bits = transform(sequence(lit(0), lit(63), lit(1)), j => {
      val charIdx = floor(j / 4).cast("int")
      val bitIdx = pmod(j, lit(4)).cast("int")
      val vote = aggregate(hx, lit(0), (acc, h) => {
        val d = conv(h.substr(charIdx + 1, lit(1)), 16, 10).cast("int")
        acc + (pmod(floor(d / element_at(pw, bitIdx + 1)).cast("int"), lit(2)) * 2 - 1)
      })
      when(vote > 0, lit("1")).otherwise(lit("0"))
    })
    concat_ws("", bits)
  }

  /** SimHash table: (doc_id, simhash bitstring). */
  def simhash(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), simhashExpr(col(textCol)).as("simhash"))

  /** Hamming distance between two equal-length bitstrings — fused
    * one-pass expression (graft.plans.HammingDistance); value-identical
    * to the per-position substr comparison fold. */
  def hammingDist(a: Column, b: Column, bits: Int = 64): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.HammingDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** HOF reference form of [[hammingDist]] (parity-tested; mirrors the
    * q_simhash_pairs oracle SQL). */
  def hammingDistHof(a: Column, b: Column, bits: Int = 64): Column =
    aggregate(sequence(lit(1), lit(bits), lit(1)), lit(0), (acc, i) =>
      acc + when(a.substr(i, lit(1)) =!= b.substr(i, lit(1)), 1).otherwise(0))

  /** SimHash near-dup: band the bitstring (4×16 chars), candidates share
    * a band, keep pairs with hamming ≤ maxHamming. */
  def simhashDups(docs: DataFrame, maxHamming: Int = 16,
      textCol: String = "text"): DataFrame = {
    // materialized once (both join sides); checkpoint blocks GC'd with
    // the result — no CacheManager leak
    val sh = simhash(docs, textCol).localCheckpoint(true)
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(transform(sequence(lit(0), lit(3), lit(1)), b =>
        struct(b.as("band"), col("simhash").substr(b * 16 + 1, lit(16)).as("bucket"))))
        .as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
    banded.as("a").join(banded.as("b"),
      col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hammingDist(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Quality-aware canonical selection — the curation policy layered on
    * [[dupClusters]]: each near-dup cluster keeps its HIGHEST-quality
    * member (ties → smaller doc_id) instead of the lowest id, the form
    * real corpus builds use (drop the worse near-duplicates, keep the
    * best exemplar). Input `clusters` is the (doc_id, canonical_id)
    * labeling; `scored` carries (doc_id, quality). Output: one row per
    * cluster — (cluster_id, kept_doc_id, n_members, kept_quality).
    *
    * Scale: one equi-join on doc_id plus a window partitioned by
    * cluster — partition size is the cluster size (near-dup clusters
    * are small by construction), never the corpus. */
  def keepBestByQuality(clusters: DataFrame, scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wCount = Window.partitionBy(col("canonical_id"))
    val wPick = Window.partitionBy(col("canonical_id"))
      .orderBy(col("quality").desc, col("doc_id"))
    clusters.join(scored, Seq("doc_id"))
      .withColumn("n_members", count(lit(1)).over(wCount))
      .withColumn("pick", row_number().over(wPick))
      .where(col("pick") === 1)
      .select(col("canonical_id").as("cluster_id"),
        col("doc_id").as("kept_doc_id"),
        col("n_members"),
        col("quality").as("kept_quality"))
      .orderBy(col("cluster_id"))
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo 1995, the merge/
    * purge method) — the third candidate-generation family next to LSH
    * bands and SimHash bands: globally ORDER the corpus by a similarity-
    * preserving key (here the SimHash bitstring — near-dups sort near
    * each other) and compare only rows within a sliding window of `w`
    * positions. Output: (doc_a, doc_b, hamming) for window pairs within
    * `maxHamming`, doc_a < doc_b. Candidate volume is exactly n·(w−1) —
    * the method's defining bound.
    *
    * Scale: the global position comes from the
    * [[Sharding.evenSplitScalable]] technique (range-partitioned sort +
    * per-partition monotonic ids + a partition-count offset fixup), so
    * there is NO single-task global window anywhere; the sliding window
    * itself is a (w−1)-fold offset explode equi-joined on position —
    * all hash joins over (id, key, pos) triples, never the texts. */
  def sortedNeighborhoodPairs(docs: DataFrame, window: Int,
      maxHamming: Int, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val localIdxMask = (1L << 33) - 1
    val keyed = docs.select(col("doc_id"),
      simhashExpr(col(textCol)).as("simhash"))
    val sorted = keyed.repartitionByRange(parts, col("simhash"), col("doc_id"))
      .sortWithinPartitions(col("simhash"), col("doc_id"))
      .withColumn("_mid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val countByPid = sorted
      .groupBy(shiftright(col("_mid"), 33).as("_pid"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1))).toMap
    val offsets = new Array[Long](parts)
    var running = 0L
    var pid = 0
    while (pid < parts) {
      offsets(pid) = running
      running += countByPid.getOrElse(pid, 0L)
      pid += 1
    }
    val pos = element_at(typedLit(offsets.toSeq),
      shiftright(col("_mid"), 33).cast("int") + 1) +
      (col("_mid").bitwiseAND(lit(localIdxMask)))
    val ranked = sorted.withColumn("pos", pos).drop("_mid")
      .localCheckpoint(true) // both join sides read it; one evaluation
    sorted.unpersist(blocking = false)
    // each row pairs with the next `window-1` positions: explode the
    // offsets on one side, equi-join on position
    val left = ranked.select(col("doc_id").as("id_l"),
        col("simhash").as("sh_l"), col("pos"),
        explode(sequence(lit(1), lit(window - 1))).as("off"))
      .withColumn("pos_r", col("pos") + col("off"))
    left.join(ranked.select(col("doc_id").as("id_r"),
        col("simhash").as("sh_r"), col("pos").as("pos_r")), Seq("pos_r"))
      .select(
        least(col("id_l"), col("id_r")).as("doc_a"),
        greatest(col("id_l"), col("id_r")).as("doc_b"),
        hammingDist(col("sh_l"), col("sh_r")).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Dedup candidate-quality evaluation — the tuning dashboard for any
    * approximate pair generator (MinHash/LSH, SimHash, winnowing)
    * against an exact Jaccard ground truth ([[ngramJaccardDups]] with a
    * constant block = global PPJoin): one row of
    * (n_candidates, n_exact, n_hit, precision_pm, recall_pm) with
    * per-mille integer division (the [[AnnEval.recallReportRow]]
    * discipline — engine-exact, no decimal-tie trap). This is how the
    * band/hash-count knobs get chosen before a 100 TB run.
    *
    * Scale: both pair sets are candidate-bounded (LSH-banded / prefix-
    * filtered — tiny relative to the corpus); canonicalize + one
    * grouped union and a global fold. Nothing touches the corpus. */
  def pairQualityReport(candidates: DataFrame, exact: DataFrame): DataFrame = {
    def canon(df: DataFrame) = df.select(
      least(col("doc_a"), col("doc_b")).as("a"),
      greatest(col("doc_a"), col("doc_b")).as("b")).distinct()
    canon(candidates)
      .withColumn("in_c", lit(1L)).withColumn("in_e", lit(0L))
      .unionAll(canon(exact)
        .withColumn("in_c", lit(0L)).withColumn("in_e", lit(1L)))
      .groupBy(col("a"), col("b"))
      .agg(max(col("in_c")).as("c"), max(col("in_e")).as("e"))
      .agg(sum(col("c")).as("nc"), sum(col("e")).as("ne"),
        sum(col("c") * col("e")).as("nh"))
      .select(
        col("nc").cast("long").as("n_candidates"),
        col("ne").cast("long").as("n_exact"),
        col("nh").cast("long").as("n_hit"),
        // an empty side reports 0, not an ANSI divide-by-zero
        when(col("nc") > 0, expr("nh * 1000 div nc")).otherwise(lit(0L))
          .cast("long").as("precision_pm"),
        when(col("ne") > 0, expr("nh * 1000 div ne")).otherwise(lit(0L))
          .cast("long").as("recall_pm"))
  }
}
