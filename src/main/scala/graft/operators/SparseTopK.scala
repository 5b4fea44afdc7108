package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Early-terminating exact top-k over an impact-ordered inverted index —
  * Fagin's Threshold Algorithm (Fagin, Lotem & Naor 2001), the classic
  * exact alternative to exhaustively scoring every posting (the lexical
  * analog of the IVF "probe a few cells" idea; WAND/MaxScore are the
  * document-at-a-time cousins). The reference's lexical side
  * (README.md:96 hybrid search) scores full posting lists; this is the
  * index-shaped upgrade that keeps the SAME exact answer.
  *
  * Two pieces:
  *   - [[buildImpactIndex]]: (term, doc_id, impact, impact_rank) where
  *     impact is the BM25 per-term contribution ([[Bm25]]'s termScore,
  *     same k1/b) and impact_rank orders each term's postings by impact
  *     desc (ties by doc_id). This is the one-time index artifact — at
  *     100 TB it persists as a parquet table partitioned/sorted so a
  *     `impact_rank <= p` predicate prunes the scan.
  *   - [[taTopK]]: iterative prefix-deepening. Round with prefix depth p
  *     reads only rank ≤ p postings of the query terms (sorted access),
  *     fully scores the candidate docs seen so far (random access, a
  *     left-semi join), and stops when the k-th candidate score θ
  *     strictly beats the threshold τ = Σ_t impact(t, rank p): any doc
  *     outside the prefixes has per-term impact ≤ the rank-p impact for
  *     every non-exhausted term and no postings at all on exhausted
  *     terms, so its score ≤ τ < θ — the candidate top-k is EXACT. p
  *     doubles per round, so termination is ≤ log2(maxlist/k) rounds
  *     even when τ never separates (fully exhausted lists = exhaustive
  *     scoring = trivially exact).
  *
  * Scale: every round is one pushed-down prefix scan + one semi-joined
  * aggregate; driver state is ≤ |queryTerms| tail rows and k score rows
  * (control plane). The per-doc score folds in sorted term order — the
  * [[Bm25]] bit-parity discipline — so the TA result hash-matches the
  * exhaustive DuckDB oracle. The final ranking is window-free
  * ([[HybridSearch.rankBounded]] over ≤ k rows).
  */
object SparseTopK {

  /** Per-round trace of the TA loop (audited by `SparseTopKSpec`):
    * `postingsRead` is the CERTIFICATE's prefix coverage — Σ_t
    * min(len_t, p) at the terminating depth p, i.e. the sorted access
    * TA's stopping proof accounts for. It is a regime indicator, not a
    * row counter: when the final job takes the coverage bypass
    * (prefix ≥ [[PruneSkipRatio]] of the postings) the scoring join
    * deliberately scans ALL query postings (row-identical by the
    * certificate), so actual rows scanned there equal `queryPostings`,
    * not `postingsRead` (ADVICE r13). */
  final case class TaStats(
      rounds: Int, prefixDepth: Long, postingsRead: Long, queryPostings: Long)

  /** The corpus-sized tf cache pinned by the most recent
    * [[buildImpactIndex]] call — ONE per process by construction: a
    * same-corpus rebuild reuses it (cache-manager plan equality), a
    * different-corpus build swaps it out, so builds can never stack
    * corpus-scale cached tables. It deliberately outlives the build
    * (the lshPairsOnce stored-artifact discipline): every TA/BM25 query
    * over the same corpus shares the one materialized stats table.
    *
    * Swap-not-stack has a sharp edge: two pipelines ALTERNATING builds
    * over different corpora will persist/unpersist a corpus-scale table
    * on every call (thrash, never wrong). Multi-corpus callers should
    * hold their own `persist()` handle on each corpus's index instead
    * of relying on this single slot. */
  private val lastTfCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame]()

  /** Control-plane scalars of the cached tf (r15, guide §5): (analyzed
    * tf plan, n docs, Σ tf). Same lifecycle as [[lastTfCache]] — the
    * scalars are pure functions of the cached table, so a same-corpus
    * rebuild reuses them without re-running the one-row aggregate job
    * (the build's only remaining corpus action besides the caller's
    * index job); a different-corpus build swaps them out with the tf
    * slot. Keyed by `sameResult` on the analyzed plan, exactly the
    * equality the cache manager uses for the tf blocks themselves. */
  private val lastTfScalars = new java.util.concurrent.atomic.AtomicReference[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Long, Long)]()

  /** Explicit lifecycle hook: unpersist the current tf cache (e.g. a
    * pipeline done with its sparse stage). Safe any time — an
    * un-consumed index recomputes through lineage. */
  def releaseBuildCache(): Unit = lastTfCache.synchronized {
    val tf = lastTfCache.getAndSet(null)
    lastTfScalars.set(null)
    if (tf != null) tf.unpersist(blocking = false)
  }

  /** Impact-ordered inverted index over ALL corpus terms. The per-term
    * rank is a window sort of that term's postings — the cost any
    * impact-ordered index build pays once; at 100 TB hot terms make the
    * term partition large, which is a build-time range-sort per posting
    * list, not a query-time cost. */
  def buildImpactIndex(docs: DataFrame, k1: Double = 1.2, b: Double = 0.75,
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    // tf is the one corpus-sized intermediate every downstream branch
    // (lens, totalLen, df, the final join) reads; without a
    // materialization point the totalLen action below and the caller's
    // index job EACH replay the tokenize+shuffle pass. Lazy persist (the
    // q_kn_bigram precedent): the totalLen job computes tf once and
    // caches; the index job reads blocks. At 100 TB this is the
    // materialization any impact-index build pays between its stats
    // pass and its ranking pass (MEMORY_AND_DISK — spills, lineage kept).
    val tfRaw = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // len (per doc) and df (per term) attached INSIDE the cached table
    // (r15): window aggregates over tf — same values the old
    // groupBy+join form produced row for row (long sums / counts, then
    // identical double expressions downstream) — paid ONCE at cache
    // materialization instead of per build call. Two exchanges total
    // (doc_id, then term) replace the old plan's two aggregate
    // exchanges plus two join re-shuffles; and because the cache comes
    // out hash-partitioned by `term`, a same-corpus rebuild's
    // impact_rank window re-uses that clustering — the per-call index
    // job is a single exchange-free stage over cached blocks. Docs with
    // no tokens have no tf rows, exactly as the old inner joins dropped
    // them.
    val wDoc = Window.partitionBy(col("doc_id"))
    val wTerm = Window.partitionBy(col("term"))
    val statsRaw = tfRaw
      .withColumn("len", sum(col("tf")).over(wDoc).cast("long"))
      .withColumn("df", count(lit(1)).over(wTerm))
    // Deliberate process-level stored artifact (the lshPairsOnce
    // discipline): if an EQUAL-plan tf is already cached (same corpus —
    // Dataset.storageLevel consults the cache manager by canonicalized
    // plan), reuse it rather than re-registering; a repeat build over
    // the SAME corpus then reads warm blocks and pins nothing new.
    // Only a different-corpus build persists fresh — and swaps out the
    // previous cache so builds can never stack corpus-scale tables.
    // The check+persist+swap is serialized: two concurrent same-corpus
    // builds would otherwise BOTH see storageLevel NONE, both persist
    // the equal plan (one shared cache-manager entry), and the second
    // getAndSet would unpersist the first DataFrame — dropping the
    // shared entry the cache exists to provide (perf-only race: results
    // recompute through lineage, but the reuse is silently lost).
    val tf = lastTfCache.synchronized {
      if (statsRaw.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
        statsRaw
      else {
        val t = statsRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val prior = lastTfCache.getAndSet(t)
        if (prior != null) prior.unpersist(blocking = false)
        t
      }
    }
    // ONE control-plane job for BOTH scalars (r15, guide §5): n (doc
    // count) and totalLen = Σ_doc len = Σ tf — the latter directly from
    // the tf table, the SAME integer sum (order-free, value-identical
    // to summing per-doc lens). The union's two one-row aggregate
    // subtrees run in one action, which also doubles as the tf-cache
    // materialization job (the old form paid docs.count() + a lens
    // aggregate + head — two corpus actions). A same-corpus rebuild
    // skips even that: the scalars are pure functions of the cached tf
    // table and ride in the [[lastTfScalars]] slot next to it (fresh
    // JVMs and different corpora always recompute).
    val tfPlan = tf.queryExecution.analyzed
    val memo = Option(lastTfScalars.get).filter(_._1.sameResult(tfPlan))
    val (n, totalLen) = memo match {
      case Some((_, mn, ml)) => (mn, ml)
      case None =>
        val scalars = docs.agg(count(lit(1)).cast("long").as("v"))
          .withColumn("k", lit("n"))
          .unionByName(tf.agg(sum(col("tf")).cast("long").as("v"))
            .withColumn("k", lit("len")))
          .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
        val vals = (scalars("n"), scalars("len"))
        lastTfCache.synchronized {
          // memoize only while this tf is still the cached slot (a
          // concurrent different-corpus build may have swapped it)
          val cur = lastTfCache.get
          if (cur != null && cur.queryExecution.analyzed.sameResult(tfPlan))
            lastTfScalars.set((tfPlan, vals._1, vals._2))
        }
        vals
    }
    val avgdl = totalLen.toDouble / n
    val idf = log((lit(n.toDouble) - col("df").cast("double") + 0.5) /
      (col("df").cast("double") + 0.5) + 1.0)
    val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("len").cast("double") / avgdl)
    val impact = idf * (col("tf").cast("double") * (k1 + 1.0)) /
      (col("tf").cast("double") + norm)
    val w = Window.partitionBy(col("term"))
      .orderBy(col("impact").desc, col("doc_id"))
    tf.select(col("term"), col("doc_id"), impact.as("impact"))
      .withColumn("impact_rank", row_number().over(w).cast("long"))
  }

  /** Exact top-k for a bag-of-words query: (rank, doc_id, score).
    * Runs the loop directly — [[taTopKWithStats]] additionally pays an
    * exhaustive-postings count job that exists only to fill the audit's
    * `queryPostings` denominator, which this result path never reads. */
  def taTopK(index: DataFrame, queryTerms: Seq[String], k: Int): DataFrame =
    taLoop(index, queryTerms, k)._1

  /** Persist the impact index as the STORED artifact the TA serve path
    * reads: partitioned by a term-hash bucket (vocab-safe — never one
    * directory per term) and sorted within files by (term, impact_rank),
    * so a query's scan prunes to its terms' bucket DIRECTORIES
    * (PartitionFilters) and its `impact_rank <= p` prefix prunes row
    * groups via parquet min/max stats on the sorted column
    * (PushedFilters). The lexical twin of [[IvfIndex.writeIndex]].
    *
    * `numBuckets = 0` (the default) applies the BUILD-TIME SCALING RULE
    * (r13 verdict item 1 — the lexical analog of IVF's nlist ≈ √n,
    * vector_search_cluster.py:1027): buckets = the power of two that
    * keeps ~`targetPostingsPerBucket` postings per bucket directory,
    * clamped to [16, 4096]. A fixed bucket count makes the per-serve
    * scan grow LINEARLY in corpus size (each bucket holds 1/buckets of
    * every posting) — the r12/r13 scaling decades measured exactly that
    * tail on the persisted TA serve. The chosen count rides in
    * `path/_ta_meta.json` and [[taTopKPersisted]] reads it by name, so
    * no caller carries the knob. Two sidecar artifacts (underscore
    * prefix — invisible to the data scan's partition discovery):
    *
    *   - `_ta_meta.json` — {num_buckets, total_postings};
    *   - `_termstats`    — per-term list length + the exact impact at
    *     every power-of-two rank (≤ ~log₂(len) rows of ladder per
    *     term), partitioned by the same term-hash bucket. This is the
    *     serve-time tails table: the TA walk reads ≤ |queryTerms| rows
    *     from it instead of aggregating the full query postings per
    *     serve (the 19.4M-row working-set term the r13 attribution
    *     measured at 1000× docs). */
  def writeIndex(index: DataFrame, path: String, numBuckets: Int = 0,
      targetPostingsPerBucket: Long = 500000L): Unit = {
    val spark = index.sparkSession
    // one build-time materialization: the bucket count needs the total
    // posting count, and the nodes write + termstats aggregate both
    // re-read the index — persist once, three consumers, unpersist
    val idx = index.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val total = idx.count()
      val nb =
        if (numBuckets > 0) numBuckets
        else {
          val want = math.max(1L,
            (total + targetPostingsPerBucket - 1) / targetPostingsPerBucket)
          math.min(4096, math.max(16, Integer.highestOneBit(
            math.min(want, 4096L).toInt * 2 - 1)))
        }
      val bucket = pmod(xxhash64(col("term")), lit(nb.toLong))
      // the nodes table and the `_termstats` sidecar are INDEPENDENT
      // consumers of the just-materialized idx cache — run the two
      // write jobs concurrently (guide §2.6: overlap independent jobs;
      // at build scale the tails aggregate hides entirely under the
      // nodes write, at bench scale the wall cost is max, not sum)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val nodesF = Future {
        idx
          .withColumn("bucket", bucket)
          .repartition(col("bucket"))
          .sortWithinPartitions(col("term"), col("impact_rank"))
          .write.partitionBy("bucket").mode("overwrite").parquet(path)
      }
      // per-term tails: exact impact at every power-of-two rank. The
      // serve-time ladder walk is driver arithmetic over these rows —
      // EXACT at each rung, so TA's certificate is unchanged; only the
      // rung positions differ from the in-memory loop's k-doubling
      // ladder (any increasing rung sequence terminates and certifies).
      // Written to a SIBLING temp dir (the nodes write's overwrite
      // deletes `path` itself at job start — writing the sidecar inside
      // it concurrently would race that delete) and renamed into place
      // once both jobs commit.
      val statsTmp = s"${path}__termstats_tmp"
      val statsF = Future {
        idx.groupBy(col("term"))
          .agg(max(col("impact_rank")).as("len"),
            sort_array(collect_list(when(
              col("impact_rank").bitwiseAND(col("impact_rank") - 1) === 0L,
              struct(col("impact_rank").as("r"), col("impact").as("impact")))))
              .as("ladder"))
          .withColumn("bucket", bucket)
          .repartition(col("bucket"))
          .sortWithinPartitions(col("term"))
          .write.partitionBy("bucket").mode("overwrite").parquet(statsTmp)
      }
      Await.result(nodesF, Duration.Inf)
      Await.result(statsF, Duration.Inf)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.rename(new org.apache.hadoop.fs.Path(statsTmp),
        new org.apache.hadoop.fs.Path(s"$path/_termstats"))
      writeTaMeta(spark, path, nb, total)
    } finally idx.unpersist(blocking = false)
  }

  /** The serve-time index descriptor: bucket count + total postings. */
  final case class TaIndexMeta(numBuckets: Int, totalPostings: Long)

  private def writeTaMeta(spark: org.apache.spark.sql.SparkSession,
      path: String, numBuckets: Int, totalPostings: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_ta_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      s"""{"num_buckets":$numBuckets,"total_postings":$totalPostings}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  /** None for indexes written before the sidecar existed (pre-r14) —
    * those serve with the caller's `numBuckets` and the aggregate-tails
    * loop, the old behavior. */
  private[graft] def readTaMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[TaIndexMeta] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_ta_meta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val re = """"num_buckets"\s*:\s*(\d+).*"total_postings"\s*:\s*(\d+)""".r
      re.findFirstMatchIn(s).map(m => TaIndexMeta(m.group(1).toInt, m.group(2).toLong))
    }
  }

  /** The serve-time bucket of a term, evaluated DRIVER-SIDE through
    * Spark's own `XxHash64` expression (not a re-implementation — the
    * identical Catalyst evaluator the `pmod(xxhash64(term), nb)` write
    * expression runs, seed 42 like the SQL function), so resolving a
    * query's bucket directories costs zero Spark jobs (r15, guide §5:
    * the old |terms|-row DataFrame collect was ~a scheduler round-trip
    * per serve purely to hash a handful of strings). Spec-pinned equal
    * to the SQL expression over a term sample. */
  private[graft] def bucketOfTerm(term: String, numBuckets: Int): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(term),
        org.apache.spark.sql.types.StringType)),
      42L // the SQL xxhash64 function's fixed seed — the write expression's
    ).eval(null).asInstanceOf[Long]
    val m = h % numBuckets
    if (m < 0) m + numBuckets else m
  }

  /** The persisted serve's SMALL-SERVE floor (r15, r14 verdict items 1
    * and 7): working sets at or above this many postings keep the full
    * TA machinery — eager localCheckpoint (the seed/final jobs would
    * otherwise re-scan the pruned read: ~28 % of the 100×-docs serve in
    * the r12 TaStages attribution, a 19.4M-row working set at 1000×)
    * plus the depth-k seed job that powers the ladder walk's early
    * stop. BELOW the floor both are driver-job deadweight: ~4M postings
    * (≈ one advisory shuffle partition of ~32-byte rows) score
    * exhaustively in one aggregate faster than the seed round-trip +
    * checkpoint jobs they'd save, so the serve reads the bucket-pruned
    * parquet directly and takes the exhaustive bypass branch — EXACT by
    * TA's certificate (scoring every query posting is the algorithm's
    * trivial case; the top-k rows cannot change). DATA-derived — the
    * stored `_termstats` lens decide per serve before any corpus job,
    * no core-count term — and sys-prop overridable so specs can force
    * both shapes on one fixture. Applies only to stored-tails serves;
    * the in-memory loop keeps its seed (its pruning audit is
    * spec-pinned and its tails already cost a job). */
  private[graft] def SmallServeFloorPostings: Long =
    sys.props.get("graft.ta.serveFloorPostings").map(_.toLong).getOrElse(1L << 22)

  /** Head-mode crossover (r15 deep-serve block prune): materialize only
    * the impact_rank ≤ p_ub head when it is under this fraction of the
    * working set — below it the saved block-store volume clearly beats
    * the final job's one extra (row-group-pruned) scan. Sys-prop
    * overridable so specs can force both shapes on one fixture. */
  private[graft] def HeadModeMaxFrac: Double =
    sys.props.get("graft.ta.headMaxFrac").map(_.toDouble).getOrElse(0.5)

  /** TA over a persisted index: bucket the query terms driver-side and
    * read only those partitions — result identical to the in-memory
    * form (same oracle). `numBuckets` is a FALLBACK for pre-r14 indexes
    * without `_ta_meta.json`; indexes carrying the sidecar serve with
    * their stored bucket count and the `_termstats` tails (no per-serve
    * tails aggregate over the query postings). */
  def taTopKPersisted(spark: org.apache.spark.sql.SparkSession, path: String,
      queryTerms: Seq[String], k: Int, numBuckets: Int = 16): DataFrame = {
    val meta = readTaMeta(spark, path)
    val nb = meta.map(_.numBuckets).getOrElse(numBuckets)
    val qts = queryTerms.distinct
    val bucketOf = qts.map(bucketOfTerm(_, nb)).distinct
    val idx = spark.read.parquet(path)
      .where(col("bucket").isin(bucketOf: _*))
    if (meta.isEmpty) taTopK(idx, queryTerms, k)
    else {
      // stored-tails serve: the ladder walk's per-term (len, impact-at-
      // rung) rows come from the _termstats sidecar — ≤ |terms| control-
      // plane rows — instead of a grouped aggregate over every query
      // posting. Rungs are the stored powers of two ≥ k; every rung
      // impact is EXACT, so the stopping certificate and the final-job
      // regime switch are the in-memory loop's verbatim (rows identical
      // at any terminating depth — only the audited depth can differ).
      val statRows = spark.read.parquet(s"$path/_termstats")
        .where(col("bucket").isin(bucketOf: _*))
        .where(col("term").isin(qts: _*))
        .select(col("term"), col("len"), col("ladder"))
        .collect()
      val tails = statRows.toSeq.map { r =>
        TermTail(r.getAs[String]("term"), r.getAs[Long]("len"),
          r.getSeq[org.apache.spark.sql.Row](2)
            .map(s => s.getAs[Long]("r") -> s.getAs[Double]("impact")).toMap)
      }
      val start = java.lang.Long.highestOneBit(math.max(1L, 2L * k - 1))
      val ladder = Iterator.iterate(start)(d => math.min(d * 2L, Long.MaxValue / 2))
        .take(64).toSeq.distinct
      val dict = termDict(qts)
      // small-serve gate (r15): the stored lens say EXACTLY how big the
      // working set is before any corpus job runs. Small sets skip the
      // materialization job AND the seed job — one exhaustive-bypass
      // final job reads the pruned parquet directly (the bucket
      // PartitionFilters + term pushdown then sit in the SERVE plan
      // itself — the r14 dossier gap); big sets keep the checkpoint
      // that kills the 1000× re-scan term and the seed that powers the
      // early stop.
      val postings = tails.map(_.len).sum
      val small = postings < SmallServeFloorPostings
      val qpLazy = withTermIds(idx.where(col("term").isin(qts: _*)), dict)
      if (small)
        taLoopCore(qpLazy, k,
          scala.concurrent.Future.successful(tails), ladder, dict,
          skipSeed = true)._1
      else {
        // deep-serve block prune (r15, VERDICT item 3 via the stored
        // ladder + the sorted files' row-group stats). The seed job
        // runs FIRST, candidate-bounded over the LAZY scan — the
        // depth-r0 prefix docs semi-join the full pruned read, so the
        // exact θ_seed costs one pass with no materialization. The
        // stored rung impacts then make the ladder walk DRIVER
        // ARITHMETIC: p* = first rung with τ(rung) < θ_seed − 1e-9 is
        // the walk's terminating depth, known BEFORE the working set is
        // built. The checkpoint then materializes only the
        // impact_rank ≤ p* head (row-group-pruned off the sorted
        // files), and the deep tail is read lazily exactly once,
        // candidate-bounded, inside the final scoring job (taLoopCore's
        // `fullPostings`). Scores fold over the identical posting
        // multiset, so rows are bit-identical; only the materialized
        // volume changes (the 19.4M-row r13 working-set term at 1000×
        // drops to its p*/len head — measured 25 % on the scale
        // fixture). Weaker driver-only bounds were tried and never
        // fired on slow-decay corpora: prefix-partial scores miss the
        // deep cross-term contributions that dominate θ there (measured
        // θ_partial 0.515 vs θ_seed ≈ 2.4 at 1000×).
        def tauOf(p: Long): Double =
          tails.collect { case t if t.len >= p => t.atRank(p) }.sum
        val r0 = ladder.head // first rung ≥ k by construction
        val seedRows = qpLazy
          .join(qpLazy.where(col("impact_rank") <= r0)
            .select(col("doc_id")), Seq("doc_id"), "left_semi")
          .groupBy(col("doc_id"))
          .agg(aggregate(
            array_sort(collect_list(struct(col("term"), col("impact")))),
            lit(0.0),
            (acc, s) => acc + s.getField("impact")).as("score"))
          .orderBy(col("score").desc, col("doc_id")).limit(k)
          .collect()
        val thetaSeed =
          if (seedRows.length >= k) seedRows.last.getAs[Double]("score")
          else Double.NegativeInfinity
        val pUb =
          if (thetaSeed.isNegInfinity) None
          else ladder.find(p => tauOf(p) < thetaSeed - 1e-9)
        val headRows = pUb.fold(postings)(p => tails.map(t => math.min(t.len, p)).sum)
        // head mode only when the bound actually slims the
        // materialization ([[HeadModeMaxFrac]] crossover)
        val headMode = pUb.isDefined && headRows < postings * HeadModeMaxFrac
        if (!headMode)
          // full-checkpoint path; the exact θ above rides in so the
          // loop's own seed job is skipped (same job count as r14)
          taLoopCore(qpLazy.localCheckpoint(true), k,
            scala.concurrent.Future.successful(tails), ladder, dict,
            thetaPre = Some(thetaSeed))._1
        else {
          val head = withTermIds(
            idx.where(col("term").isin(qts: _*) &&
              col("impact_rank") <= pUb.get), dict).localCheckpoint(true)
          taLoopCore(head, k,
            scala.concurrent.Future.successful(tails),
            ladder.takeWhile(_ <= pUb.get), dict,
            fullPostings = Some(qpLazy),
            thetaPre = Some(thetaSeed))._1
        }
      }
    }
  }

  /** Batch-query TA (verdict r7 item 6 — the lexical counterpart of the
    * dense family's "Q broadcast queries, one plan" protocol,
    * vector_search_cluster.py:794-812 batches dense queries the same
    * way): `queryTerms` is a TABLE of (query_id: long, term: string)
    * rows, and ALL queries run in the same three jobs the single-query
    * loop uses — seed scores at depth k, one ladder-tails aggregate, and
    * final scores at each query's own terminating depth. τ/θ and the
    * ladder walk are per-query ROWS of those aggregates (driver state ≤
    * Q×|terms|×~60 doubles — control plane), not Q driver loops with Q×
    * control-plane latency.
    *
    * Exactness per query is the single-query argument verbatim: θ_seed
    * (that query's k-th seed score) only grows as its prefixes deepen,
    * and any doc outside its depth-p prefixes scores ≤ τ_q(p), so
    * stopping at θ_seed > τ_q(p) keeps the candidate top-k exact;
    * exhausted ladders mean exhaustive scoring. Output: (query_id, rank,
    * doc_id, score), the k-NN result contract. */
  def taTopKBatch(index: DataFrame, queryTerms: DataFrame, k: Int): DataFrame =
    taTopKBatchWithStats(index, queryTerms, k)._1

  /** Per-query pruning trace of the batch walk (the [[TaStats]] audit,
    * batched): terminating prefix depth, sorted-access postings consumed
    * at that depth, and what exhaustive scoring would have read. */
  final case class TaBatchStats(depth: Long, postingsRead: Long, queryPostings: Long)

  def taTopKBatchWithStats(index: DataFrame, queryTerms: DataFrame,
      k: Int): (DataFrame, Map[Long, TaBatchStats]) =
    taTopKBatchCore(index, queryTerms, k, storedTails = None)

  /** Batch TA over a persisted index (r14): the batch twin of
    * [[taTopKPersisted]]. Bucket-prunes the scan to the batch's terms
    * (the pre-r14 batch query read ALL bucket directories) and, when
    * the index carries the `_termstats` sidecar, eliminates the
    * per-serve tails aggregate outright — per-term tails are
    * query-independent, so the batch's (query, term) tail rows are the
    * stored per-term rows fanned out over the collected query pairs
    * (micro-batch-small driver state). Rows identical to
    * [[taTopKBatch]] over the same index read: TA's certificate holds
    * per query at any terminating rung sequence, and both final-job
    * branches are row-identical by construction — only the audited
    * depth can differ. `numBuckets` is the pre-sidecar fallback. */
  def taTopKBatchPersisted(spark: org.apache.spark.sql.SparkSession,
      path: String, queryTerms: DataFrame, k: Int,
      numBuckets: Int = 16): DataFrame = {
    val meta = readTaMeta(spark, path)
    val nb = meta.map(_.numBuckets).getOrElse(numBuckets)
    // ZERO control-plane jobs for terms + buckets (r15; the r14 form
    // paid one distinct+collect job — each extra local job is ~0.1 s of
    // scheduler latency at suite scale): the micro-batch query table
    // collects driver-side (a LocalRelation collect launches no job;
    // any other source is one plain collect), dedup and bucketing are
    // Scala over those few rows, and the bucket hash is Spark's own
    // XxHash64 evaluated in-process ([[bucketOfTerm]]).
    val qPairs = queryTerms.select(col("query_id").cast("long"), col("term"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.distinct
    val terms = qPairs.map(_._2).distinct
    val bucketOf = terms.map(bucketOfTerm(_, nb)).distinct
    val idx = spark.read.parquet(path)
      .where(col("bucket").isin(bucketOf: _*))
    if (meta.isEmpty) taTopKBatch(idx, queryTerms, k)
    else {
      val statRows = spark.read.parquet(s"$path/_termstats")
        .where(col("bucket").isin(bucketOf: _*))
        .where(col("term").isin(terms: _*))
        .select(col("term"), col("len"), col("ladder"))
        .collect()
      val tails = statRows.toSeq.map { r =>
        TermTail(r.getAs[String]("term"), r.getAs[Long]("len"),
          r.getSeq[org.apache.spark.sql.Row](2)
            .map(s => s.getAs[Long]("r") -> s.getAs[Double]("impact")).toMap)
      }
      taTopKBatchCore(idx, queryTerms, k, storedTails = Some(tails),
        precollectedPairs = Some(qPairs))._1
    }
  }

  /** Per-(query, term) tail state of the batch walk — the batched
    * [[TermTail]]. */
  private final case class BatchTail(
      qid: Long, term: String, len: Long, atRank: Map[Long, Double])

  private def taTopKBatchCore(index: DataFrame, queryTerms: DataFrame,
      k: Int, storedTails: Option[Seq[TermTail]],
      precollectedPairs: Option[Seq[(Long, String)]] = None)
      : (DataFrame, Map[Long, TaBatchStats]) = {
    require(k > 0, "taTopKBatch: k must be positive")
    val spark = index.sparkSession
    import spark.implicits._
    // one control-plane collect serves BOTH the query-id list and (on
    // the stored-tails path) the (query, term) fan-out — q is
    // micro-batch-small by contract. The persisted caller already
    // collected the pairs job-free; rebuild the broadcast side from
    // them as a LocalRelation so neither the distinct nor the broadcast
    // launches a scan job.
    val qPairs: Seq[(Long, String)] = precollectedPairs.getOrElse(
      queryTerms.select(col("query_id").cast("long"), col("term"))
        .distinct().as[(Long, String)].collect().toSeq)
    val q = qPairs.toDF("query_id", "term")
    // every query's postings, tagged — ONE plan for all queries; the
    // query-terms side is micro-batch-small by construction → broadcast.
    // Materialized once WHEN BIG (r14 + the r15 checkpoint gate, the
    // single-query loop's r12 discipline — its re-scan term measured
    // ~28 % of the 100× serve): the walk's jobs reference qp up to SIX
    // times (seed candidates + the seed scoring semi-join, the tails
    // aggregate, and the final job's bypass/deep branches — 2-3
    // subtrees when regimes mix), and without a materialization point
    // every reference re-reads the bucket-pruned parquet and re-runs
    // the broadcast join. Batch-working-set-sized (Σ_q query postings),
    // not corpus-sized. With stored tails the lens give that size
    // driver-side BEFORE any corpus job: working sets under
    // [[CheckpointFloorPostings]] skip the materialization job — the
    // duplicate pruned-parquet read costs less than the checkpoint's
    // own job + block-store round trip, and the serve plan then shows
    // the bucket prune directly.
    val qpLazy = index.join(broadcast(q), Seq("term"))
      .select(col("query_id"), col("term"), col("doc_id"),
        col("impact"), col("impact_rank"))
    val smallServe = storedTails.exists { ts =>
      val lenOf = ts.map(t => t.term -> t.len).toMap
      qPairs.map { case (_, t) => lenOf.getOrElse(t, 0L) }.sum <
        SmallServeFloorPostings
    }
    // deep-serve block prune, batch twin (r15 — see [[taTopKPersisted]]
    // for the argument): the exact seed runs FIRST, candidate-bounded
    // over the LAZY scan (each query's depth-r0 prefix docs semi-join
    // the full pruned read — one pass, no materialization); the stored
    // tails then bound each query's terminating depth driver-side —
    // p*_q = first rung with τ_q(rung) < θ_q − 1e-9 — and the shared
    // checkpoint materializes only impact_rank ≤ max_q p*_q. Exact
    // folds read the LAZY full set once, candidate-bounded. Queries
    // with no bound (θ_q = −∞) walk off the ladder and land in the
    // exhaustive full-set bypass — exact at any θ.
    val headInfo: Option[(Option[Long], Map[Long, Double])] =
      if (smallServe) None
      else storedTails.map { ts =>
        val byTerm = ts.map(t => t.term -> t).toMap
        val r0 = java.lang.Long.highestOneBit(math.max(1L, 2L * k - 1))
        val rungs = Iterator.iterate(r0)(d => math.min(d * 2L, Long.MaxValue / 2))
          .take(64).toSeq.distinct
        val seedScores = qpLazy
          .join(qpLazy.where(col("impact_rank") <= r0)
              .select(col("query_id"), col("doc_id")),
            Seq("query_id", "doc_id"), "left_semi")
          .groupBy(col("query_id"), col("doc_id"))
          .agg(aggregate(
            array_sort(collect_list(struct(col("term"), col("impact")))),
            lit(0.0),
            (acc, s) => acc + s.getField("impact")).as("score"))
        val wSeed = Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id"))
        val thetaQ: Map[Long, Double] = seedScores
          .withColumn("rank", row_number().over(wSeed))
          .where(col("rank") === k)
          .select(col("query_id"), col("score"))
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val pUbs = qPairs.groupBy(_._1).map { case (qid, prs) =>
          val rows = prs.flatMap { case (_, t) => byTerm.get(t) }
          def tau(p: Long): Double =
            rows.collect { case t if t.len >= p => t.atRank(p) }.sum
          val th = thetaQ.getOrElse(qid, Double.NegativeInfinity)
          if (th.isNegInfinity) None else rungs.find(p => tau(p) < th - 1e-9)
        }
        val bounded = pUbs.flatten
        val headBound = bounded.maxOption.filter { b =>
          pUbs.forall(_.isDefined) && {
            val lenOf = ts.map(t => t.term -> t.len).toMap
            val total = qPairs.map { case (_, t) => lenOf.getOrElse(t, 0L) }.sum
            val head = qPairs.map { case (_, t) =>
              math.min(lenOf.getOrElse(t, 0L), b)
            }.sum
            head < total * HeadModeMaxFrac
          }
        }
        (headBound, thetaQ)
      }
    val headBound = headInfo.flatMap(_._1)
    val headWorthIt = headBound.isDefined
    // the LAZY full working set — what every exact score fold reads;
    // seed/candidate jobs run over `qp` (the checkpointed head in head
    // mode, the checkpointed full set otherwise)
    val qpFull = qpLazy
    val qp =
      if (smallServe) qpLazy
      else if (headWorthIt)
        qpLazy.where(col("impact_rank") <= headBound.get).localCheckpoint(true)
      else qpLazy.localCheckpoint(true)

    // term-sorted exact score fold (the Bm25 bit-parity discipline)
    // over whichever (query_id, doc_id) posting set the caller passes
    def scoresOf(base: DataFrame): DataFrame = base
      .groupBy(col("query_id"), col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("impact")))),
        lit(0.0),
        (acc, s) => acc + s.getField("impact")).as("score"))

    // exact scores of the docs inside each query's depth-p prefixes
    // (p rides in as a per-query row of `depths`). No distinct on the
    // candidate side: LeftSemi dedups by construction, so the explicit
    // distinct was a pure extra shuffle (r13).
    def scoresAt(depths: DataFrame): DataFrame = {
      val cands = qp.join(broadcast(depths), Seq("query_id"))
        .where(col("impact_rank") <= col("p"))
        .select(col("query_id"), col("doc_id"))
      scoresOf(qp.join(cands, Seq("query_id", "doc_id"), "left_semi"))
    }
    def topkOf(scores: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("doc_id"))
      scores.withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= k)
    }

    val qids = qPairs.map(_._1).distinct.sorted.toArray
    val seedDepths = qids.toSeq.toDF("query_id").withColumn("p", lit(k.toLong))

    // (in-memory tails): per (query, term) list length + ladder
    // impacts — OR, serving a persisted index with `_termstats`
    // ([[taTopKBatchPersisted]]), NO job at all: the stored per-term
    // rows fan out over the collected query pairs driver-side. The
    // in-memory ladder is long enough BY CONSTRUCTION for any Long
    // impact_rank (ADVICE r7: 64 overflow-clamped doublings ≥ any list
    // length — the walk below steps the same rungs, so loop and
    // collected ranks cannot diverge); stored tails carry impacts at
    // power-of-two ranks, so that path walks pow2 rungs ≥ k — any
    // increasing rung sequence terminates and certifies (rows
    // identical; only the audited depth can differ).
    val ladder = storedTails match {
      case None =>
        Iterator.iterate(k.toLong)(d => math.min(d * 2L, Long.MaxValue / 2))
          .take(64).toSeq.distinct
      case Some(_) =>
        val start = java.lang.Long.highestOneBit(math.max(1L, 2L * k - 1))
        Iterator.iterate(start)(d => math.min(d * 2L, Long.MaxValue / 2))
          .take(64).toSeq.distinct
    }
    // the seed job and the in-memory tails job are INDEPENDENT reads of
    // the (checkpointed) working set — overlap them (r15, guide §2.6:
    // actions are only sequential because the driver calls them
    // sequentially); on the stored-tails path the tails future is
    // already resolved and only the seed job runs.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val tailsF: Future[Seq[BatchTail]] = storedTails match {
      case None => Future {
        qp.groupBy(col("query_id"), col("term"))
          .agg(
            max(col("impact_rank")).as("len"),
            collect_list(when(col("impact_rank").isin(ladder: _*),
              struct(col("impact_rank"), col("impact")))).as("ladder_impacts"))
          .collect().toSeq.map { r =>
            BatchTail(r.getAs[Long]("query_id"), r.getAs[String]("term"),
              r.getAs[Long]("len"),
              r.getSeq[org.apache.spark.sql.Row](3)
                .map(s => s.getAs[Long]("impact_rank") -> s.getAs[Double]("impact"))
                .toMap)
          }
      }
      case Some(ts) =>
        val byTerm = ts.map(t => t.term -> t).toMap
        Future.successful(qPairs.flatMap { case (qid, t) =>
          byTerm.get(t).map(tt => BatchTail(qid, t, tt.len, tt.atRank))
        })
    }
    // job 1: seed scores at depth k — ≤ Q×k control-plane rows. In the
    // small-serve regime (r15) the seed is SKIPPED: θ = −∞ for every
    // query makes the ladder walk exhaust and coverage hit 1.0, so the
    // final job takes the exhaustive bypass branch for all queries —
    // exactly the rows TA certifies at any θ, for one corpus job
    // instead of two over a working set cheaper to score than to seed.
    // the stored-tails path already paid its θ job (the lazy-scan
    // candidate-bounded seed above) — skip the loop's own seed there
    val seedRows =
      if (smallServe || headInfo.isDefined) Array.empty[org.apache.spark.sql.Row]
      else topkOf(scoresAt(seedDepths)).collect()
    val thetaSeed: Map[Long, Double] = headInfo.map(_._2).getOrElse(
      seedRows
        .groupBy(_.getAs[Long]("query_id"))
        .map { case (qid, rows) =>
          qid -> (if (rows.length >= k)
            rows.map(_.getAs[Double]("score")).min
          else Double.NegativeInfinity)
        })
    val tails: Seq[BatchTail] = Await.result(tailsF, Duration.Inf)
    val byQuery = tails.groupBy(_.qid)
    val finalDepth: Seq[(Long, Long)] = qids.toSeq.map { qid =>
      val rows = byQuery.getOrElse(qid, Seq.empty)
      val lens = rows.map(_.len)
      def tauAt(p: Long): Double =
        rows.collect { case t if t.len >= p => t.atRank(p) }.sum
      val theta = thetaSeed.getOrElse(qid, Double.NegativeInfinity)
      var ri = 0
      var p = ladder(ri)
      while (ri + 1 < ladder.length && lens.exists(_ >= p) && theta <= tauAt(p)) {
        ri += 1; p = ladder(ri)
      }
      qid -> p
    }

    // job 3: final scores at each query's own depth — with the same
    // prune-bypass as the single-query loop (r12 verdict item 5),
    // decided PER QUERY (r13 verdict "what's wrong" 1: the batch-global
    // ratio let one slow-decay query drag every fast-decay query onto
    // one branch, or vice versa): each query whose terminating prefixes
    // cover ≥ PruneSkipRatio of ITS OWN postings scores all its
    // postings (the prune is deadweight there); the rest go through the
    // per-query Fagin UB prune. Row-identical by TA's certificate on
    // each query independently; the two branches partition the
    // query_id space, so the union is exactly one score row set per
    // (query, doc).
    val depthOf = finalDepth.toMap
    val coverageOf: Map[Long, Double] = qids.toSeq.map { qid =>
      val rows = byQuery.getOrElse(qid, Seq.empty)
      val total = rows.map(_.len).sum
      val prefix = rows.map(t => math.min(t.len,
        depthOf.getOrElse(qid, Long.MaxValue / 2))).sum
      qid -> (if (total > 0) prefix.toDouble / total else 1.0)
    }.toMap
    // in head mode the exact folds read the lazy full set (candidate
    // docs need random access past the head); otherwise the checkpoint
    // IS the full set. A query whose walk somehow passed the head bound
    // (defensive — p_ub_q's derivation says it cannot) must not build
    // candidates from a truncated prefix: route it to the exhaustive
    // bypass, which is exact at any θ.
    val qpScore = if (headWorthIt) qpFull else qp
    val overflow: Set[Long] =
      if (!headWorthIt) Set.empty
      else qids.toSeq.filter(q =>
        depthOf.getOrElse(q, 0L) > headBound.get).toSet
    val (bypassQids, deepQids) =
      qids.toSeq.partition(q => coverageOf(q) >= PruneSkipRatio || overflow(q))
    val bypassScores =
      if (bypassQids.isEmpty) None
      else Some(scoresOf(qpScore.where(col("query_id").isin(bypassQids: _*))))
    val deepScores =
      if (deepQids.isEmpty) None
      else {
        // the deep regime's per-query Fagin bound — the batched twin of
        // the single-query UB prune: UB_q(d) = exact prefix partial +
        // Σ over that query's non-exhausted terms whose prefix d
        // missed of impact_t(p_q); docs with UB_q < θ_q-seed cannot
        // enter that query's top-k. Per-query residuals/τ/θ ride in as
        // broadcast control-plane rows (≤ Q×|terms|); queries that
        // never seeded k results keep all candidates (θ = −∞).
        val deepSet = deepQids.toSet
        val deepTails = tails.filter(t => deepSet(t.qid))
        val depths = finalDepth.filter(d => deepSet(d._1)).toDF("query_id", "p")
        val residRows = deepTails.map { t =>
          val pq = depthOf.getOrElse(t.qid, Long.MaxValue / 2)
          val res = if (t.len >= pq) t.atRank(pq) else 0.0
          (t.qid, t.term, res)
        }
        val tauOf = residRows.groupBy(_._1).map { case (qid, rs) =>
          qid -> rs.map(_._3).sum
        }
        val ctl = residRows.map { case (qid, t, res) =>
          (qid, t, res, tauOf(qid),
            thetaSeed.getOrElse(qid, Double.NegativeInfinity))
        }.toDF("query_id", "term", "resid", "tau", "theta")
        // candidate generation reads the (head) checkpoint — prefix
        // rows are depth-bounded, all inside the head; the exact fold
        // below reads the full set
        val deepQp = qp.where(col("query_id").isin(deepQids: _*))
        val cands = deepQp.join(broadcast(depths), Seq("query_id"))
          .where(col("impact_rank") <= col("p"))
          .join(broadcast(ctl), Seq("query_id", "term"))
          .groupBy(col("query_id"), col("doc_id"))
          .agg((sum(col("impact")) + first(col("tau")) - sum(col("resid"))).as("ub"),
            first(col("theta")).as("theta"))
          .where(col("ub") >= col("theta") - 1e-9)
          .select(col("query_id"), col("doc_id"))
        Some(scoresOf(qpScore.where(col("query_id").isin(deepQids: _*))
          .join(cands, Seq("query_id", "doc_id"), "left_semi")))
      }
    val finalScores = (bypassScores, deepScores) match {
      case (Some(b), Some(d)) => b.unionByName(d)
      case (Some(b), None) => b
      case (None, Some(d)) => d
      case (None, None) => scoresOf(qp) // no queries — empty either way
    }
    val result = topkOf(finalScores)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score"), 6).as("score"))
      .orderBy(col("query_id"), col("rank"))
    val stats = finalDepth.map { case (qid, p) =>
      val lens = byQuery.getOrElse(qid, Seq.empty).map(_.len)
      qid -> TaBatchStats(p, lens.map(math.min(_, p)).sum, lens.sum)
    }.toMap
    (result, stats)
  }

  def taTopKWithStats(
      index: DataFrame, queryTerms: Seq[String], k: Int): (DataFrame, TaStats) = {
    val (result, rounds, p, read) = taLoop(index, queryTerms, k)
    (result, TaStats(rounds, p, read,
      index.where(col("term").isin(queryTerms.distinct: _*)).count()))
  }

  /** The TA loop, in THREE Spark jobs regardless of depth. θ from the
    * depth-k seed round is a LOWER bound of the final θ (candidates
    * only widen as p grows), so stopping on θ_seed > τ_p is safe: any
    * doc outside the depth-p prefixes scores ≤ τ_p < θ_seed ≤ θ_final.
    * And since the candidate depths form a fixed geometric ladder, ALL
    * the per-depth tail impacts the walk could ever need come from ONE
    * aggregate (impact at each ladder rank + list length per term) —
    * the ladder walk itself is driver-side arithmetic over ≤ |terms| ×
    * log₂(maxlist) values. Jobs: seed scores (depth k), the ladder
    * tails pass, final scores (terminating depth). The trade vs a
    * per-round-refreshed θ is a possibly deeper final prefix — sorted
    * access is the cheap side, the scoring join is the expensive one. */
  /** Final-job plan switch (r12 verdict item 5): when the terminating
    * prefix already covers at least this fraction of the query postings,
    * the candidate semi-join prune is deadweight — it pays a distinct +
    * a semi-join shuffle to exclude docs whose aggregation rows are at
    * most the complement fraction. Measured at 100× docs (replica
    * corpora decay impacts slowly, driving the terminating depth to
    * ~⅓ of list length): dropping the prune cuts the dominant final
    * scoring job. EXACTNESS IS FREE either way — TA's certificate says
    * every doc outside the depth-p prefixes scores ≤ τ(p) < θ, so
    * scoring them too can never change the top-k rows. */
  private val PruneSkipRatio = 0.5

  /** Per-term tail state the ladder walk consumes: list length + the
    * exact impact at each ladder rank present in the list. Produced by
    * the in-memory tails aggregate OR read from the `_termstats`
    * sidecar (≤ |queryTerms| rows either way). */
  private[operators] final case class TermTail(
      term: String, len: Long, atRank: Map[Long, Double])

  /** Order-preserving dense term ids for a query's term set (r14): the
    * scoring fold sorts (term, impact) structs per doc, so replacing
    * the term STRING with its rank in the sorted query-term list keeps
    * the fold order — and therefore the float sums — bit-identical,
    * while the materialized working set and the two corpus-side
    * aggregates shuffle 4-byte keys instead of strings. Driver-side
    * maps (tails, residuals) stay string-keyed; only the DataFrame
    * column carries the id. */
  private def termDict(qts: Seq[String]): Map[String, Int] =
    qts.sorted.zipWithIndex.toMap

  /** Project the postings' term column to its dense id — applied BEFORE
    * the working-set checkpoint so the materialization is slimmer. */
  private def withTermIds(postings: DataFrame, dict: Map[String, Int]): DataFrame =
    postings.select(
      element_at(typedLit(dict), col("term")).as("term"),
      col("doc_id"), col("impact"), col("impact_rank"))

  private def taLoop(index: DataFrame, queryTerms: Seq[String], k: Int)
      : (DataFrame, Int, Long, Long) = {
    require(k > 0, "taTopK: k must be positive")
    val qts = queryTerms.distinct
    val dict = termDict(qts)
    val byId = dict.map(_.swap)
    // materialized once: the loop's three jobs (seed scores, ladder
    // tails, final scores — and scoresAt joins qPostings against ITSELF)
    // would otherwise each re-scan the persisted index; the r12 stage
    // attribution (graft.TaStages, SCALE.md) measured that re-scan term
    // at ~28 % of the 100×-docs serve. Query-terms-sized × list length —
    // the serve-plane working set, not the corpus.
    val qPostings = withTermIds(index.where(col("term").isin(qts: _*)), dict)
      .localCheckpoint(true)
    // 64 overflow-clamped doublings cover ANY Long impact_rank, and the
    // walk below clamps identically, so the loop and the collected ranks
    // cannot diverge (ADVICE r7 — the 42-rung ladder left an implicit
    // k·2^42 invariant)
    val ladder = Iterator.iterate(k.toLong)(d => math.min(d * 2L, Long.MaxValue / 2))
      .take(64).toSeq.distinct
    // one pass: per term, the full list length and the impact at every
    // geometric-ladder rank — ≤ |terms| × ~60 values of driver state.
    // Launched as a FUTURE so the tails job overlaps the seed job inside
    // taLoopCore (r15, guide §2.6) — both are independent reads of the
    // eager checkpoint above.
    import scala.concurrent.Future
    import scala.concurrent.ExecutionContext.Implicits.global
    val tailsF = Future {
      qPostings.groupBy(col("term"))
        .agg(
          max(col("impact_rank")).as("len"),
          collect_list(when(col("impact_rank").isin(ladder: _*),
            struct(col("impact_rank"), col("impact")))).as("ladder_impacts"))
        .collect().toSeq.map { r =>
          TermTail(byId(r.getAs[Int]("term")), r.getAs[Long]("len"),
            r.getSeq[org.apache.spark.sql.Row](2)
              .map(s => s.getAs[Long]("impact_rank") -> s.getAs[Double]("impact"))
              .toMap)
        }
    }
    taLoopCore(qPostings, k, tailsF, ladder, dict)
  }

  /** Seed + driver ladder walk + adaptive final job over ALREADY
    * term-filtered, materialized postings, with the per-term tails and
    * the rung sequence injected (the in-memory loop aggregates them per
    * serve; the persisted serve reads them from `_termstats`). Any
    * increasing rung sequence is exact — TA's certificate holds at
    * every depth — so the two callers' results are row-identical; only
    * the audited terminating depth can differ. `qPostings.term` carries
    * the [[termDict]] dense id (order-preserving — the fold stays
    * bit-identical); driver-side tails stay string-keyed and map
    * through `dict` at the one expression that needs a column-typed
    * literal (the UB residuals). */
  private def taLoopCore(qPostings: DataFrame, k: Int,
      tailsF: scala.concurrent.Future[Seq[TermTail]], ladder: Seq[Long],
      dict: Map[String, Int],
      skipSeed: Boolean = false,
      fullPostings: Option[DataFrame] = None,
      thetaPre: Option[Double] = None): (DataFrame, Int, Long, Long) = {
    require(k > 0, "taTopK: k must be positive")
    // head mode (r15, the deep-serve block prune): `qPostings` is only
    // the impact_rank ≤ p_ub HEAD of the working set (the stored-tails
    // caller proved the walk must stop by p_ub before any corpus job)
    // and `fullPostings` is the LAZY unlimited read. Every exact-score
    // consumer folds over `full`; the seed/prefix/UB jobs — the ones
    // that run more than once — touch only the slim head. θ_seed from
    // head partials is a LOWER bound on the true k-th score (partial ≤
    // true), so the stopping rule and the UB prune stay exact verbatim.
    val full = fullPostings.getOrElse(qPostings)

    // exact scores folded in sorted term order (Bm25 bit-parity
    // discipline) over whichever doc set the caller passes
    def scoresOf(base: DataFrame): DataFrame = base
      .groupBy(col("doc_id"))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("impact")))),
        lit(0.0),
        (acc, s) => acc + s.getField("impact")).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)

    // seed scores for the docs seen in the depth-p prefixes (no
    // distinct on the candidate side — LeftSemi dedups by construction,
    // so the explicit distinct was a pure extra shuffle; r13). In head
    // mode these are head partials — a valid θ lower bound, never the
    // emitted result.
    def scoresAt(p: Long): DataFrame = scoresOf(qPostings
      .join(qPostings.where(col("impact_rank") <= p)
        .select(col("doc_id")), Seq("doc_id"), "left_semi"))

    // FINAL exact scores of the depth-p candidates — folds over the
    // full posting set (candidate docs need random access past p)
    def finalScoresAt(p: Long): DataFrame = scoresOf(full
      .join(qPostings.where(col("impact_rank") <= p)
        .select(col("doc_id")), Seq("doc_id"), "left_semi"))

    // ≤ k rows — control plane. `skipSeed` (the r15 small-serve regime,
    // stored-tails callers only): θ = −∞ exhausts the ladder walk and
    // drives coverage to 1.0, so the final job below is the exhaustive
    // bypass — the rows TA certifies at any θ, minus one driver job.
    // `thetaPre` (head mode): the caller already bounded θ with the
    // partial-seed job — skip the loop's own seed entirely
    val seedRows =
      if (skipSeed || thetaPre.isDefined) Array.empty[org.apache.spark.sql.Row]
      else scoresAt(k.toLong).collect()
    val thetaSeed = thetaPre.getOrElse(
      if (seedRows.length >= k) seedRows.last.getAs[Double]("score")
      else Double.NegativeInfinity)
    // the tails job (if any) ran concurrently with the seed job above
    val tails = scala.concurrent.Await.result(
      tailsF, scala.concurrent.duration.Duration.Inf)

    val lens = tails.map(_.len)
    val atRank: Map[(String, Long), Double] = tails.flatMap { t =>
      t.atRank.map { case (r, imp) => (t.term, r) -> imp }
    }.toMap
    // driver-side ladder walk — identical stopping rule to the
    // one-aggregate-per-round form, minus the per-round jobs
    def tauAt(p: Long): Double =
      tails.collect { case t if t.len >= p => atRank((t.term, p)) }.sum
    var rung = 0
    var p = ladder(rung)
    var rounds = 1
    while (rung + 1 < ladder.length && lens.exists(_ >= p) && thetaSeed <= tauAt(p)) {
      rung += 1
      p = ladder(rung)
      rounds += 1
    }
    // final-job plan switch (r12 verdict item 5): the ladder's tail rows
    // already tell us — driver-side, free — what fraction of the query
    // postings the terminating prefix covers. Slow-decay corpora (near-
    // dup replicas) drive p to a large fraction of the lists; there the
    // candidate semi-join prunes almost nothing and its distinct +
    // shuffle are pure overhead, so score ALL query postings instead.
    // Identical rows either way: TA's certificate puts every out-of-
    // prefix doc strictly below θ, so the top-k cannot change.
    val prefixRows = lens.map(math.min(_, p)).sum
    val totalRows = lens.sum
    val top =
      if (totalRows > 0 && prefixRows.toDouble / totalRows >= PruneSkipRatio)
        scoresOf(full)
      else if (fullPostings.isDefined &&
          lens.exists(_ > p) && thetaSeed <= tauAt(p))
        // head-mode guard (defensive; p_ub's derivation proves the
        // certificate fires by the truncated ladder's last rung, so this
        // never runs in exact arithmetic — and it subsumes the θ = −∞
        // case, where no certificate can ever fire): certificate not met
        // at the head boundary → score everything exhaustively — exact
        // at any θ
        scoresOf(full)
      else if (thetaSeed == Double.NegativeInfinity)
        finalScoresAt(p)
      else {
        // the deep regime's second prune (r13): Fagin's random-access
        // bound, per candidate. A doc's score is at most its EXACT
        // prefix partial plus, for every non-exhausted term whose
        // prefix it missed, that term's rank-p impact:
        //   UB(d) = Σ_{t: d∈prefix_t} impact + Σ_{t: d∉prefix_t, len_t ≥ p} impact_t(p)
        //         = partial(d) + τ(p) − Σ_{t: d∈prefix_t} resid_t
        // Docs with UB < θ_seed ≤ θ_final cannot enter the top-k, so
        // only survivors reach the expensive full-scoring join — at
        // 1000× docs the prefix holds ~everything the clouds tied
        // together, but only ~k docs survive the bound. The 1e-9 slack
        // covers unordered-sum float noise against the sorted-fold
        // scores (UB ≥ score holds in exact arithmetic; equal-impact
        // ties make the bound TIGHT, so a bit-level undershoot must
        // not prune a true member).
        val resid = tails.map { t =>
          t.term -> (if (t.len >= p) atRank((t.term, p)) else 0.0)
        }.toMap
        val tau = resid.values.sum
        val residById = resid.map { case (t, v) => dict(t) -> v }
        val cands = qPostings.where(col("impact_rank") <= p)
          .select(col("doc_id"), col("impact"),
            element_at(typedLit(residById), col("term")).as("resid"))
          .groupBy(col("doc_id"))
          .agg((sum(col("impact")) + lit(tau) - sum(col("resid"))).as("ub"))
          .where(col("ub") >= thetaSeed - 1e-9)
          .select(col("doc_id"))
        scoresOf(full.join(cands, Seq("doc_id"), "left_semi"))
      }
    val result = top.join(
        HybridSearch.rankBounded(top, "doc_id", "score"), Seq("doc_id"))
      .select(col("rank"), col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy(col("rank"))
    (result, rounds, p, lens.map(math.min(_, p)).sum)
  }
}
