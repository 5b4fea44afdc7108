package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{IvfIndex, QualityClassifier}

/** Plan-shape regression gates for the scale-critical invariants SCALE.md
  * claims: broadcasts where a side is small by construction, partial+final
  * WindowGroupLimit for top-k, filter/projection pushdown into the scan,
  * partition-pruned IVF probe reads, and the absence of any global
  * (unpartitioned) window in the sharding path. Results are checked by
  * the DuckDB oracle; THESE tests pin the plans that make the same
  * results survive a 100× scale-up. */
class PlanShapeSpec extends SparkSpec {

  private def planOf(df: DataFrame): String = {
    // sibling suites cache the same parquet relations; a cache hit would
    // swap the FileScan (and its PushedFilters/ReadSchema) for an
    // InMemoryTableScan and void the pushdown assertions
    spark.catalog.clearCache()
    df.queryExecution.executedPlan.toString
  }

  test("q_flat_knn: broadcast queries, partial+final WindowGroupLimit, no sort-merge join") {
    val p = planOf(Registry.queries("q_flat_knn")(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query side must broadcast — big side must not shuffle")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial") && p.contains("Final"),
      "top-k must partial-limit per partition before the final merge")
    assert(!p.contains("SortMergeJoin"), "no big-big shuffle join in the k-NN path")
  }

  test("q_fingerprint: filter pushed to parquet, only needed columns read") {
    val p = planOf(Registry.queries("q_fingerprint")(spark, sf0001))
    assert(p.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,50)]"),
      "vec_id predicate must reach the parquet scan")
    assert(p.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"),
      "scan must prune to the two projected columns (no label)")
  }

  test("q_shard_even: no window operator at all (the scalable split)") {
    val p = planOf(Registry.queries("q_shard_even")(spark, sf0001))
    assert(!p.contains("Window"),
      "evenSplitScalable must not plan any window — the ntile form funnels " +
        "the table through one task")
  }

  test("IVF searchPruned on a persisted index: partition-pruned scan + broadcast probe join") {
    val dir = Files.createTempDirectory("ivfplan").toString
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = IvfIndex.seedCentroids(emb, 8)
    IvfIndex.writeIndex(IvfIndex.assign(emb, cents), cents, dir)
    val (loaded, assignments) = IvfIndex.loadIndex(spark, dir)
    val q = emb.where(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val p = planOf(IvfIndex.searchPruned(q, loaded, assignments, nprobe = 2, k = 5))
    assert(p.contains("PartitionFilters: [cluster_id"),
      "probed cluster ids must prune the assignments read — the reference's " +
        "nprobe/nlist cell pruning")
    assert(p.contains("BroadcastHashJoin"),
      "the tiny probe set must broadcast against the pruned scan")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_ivf_pruned_knn: registry query reads only probed partitions") {
    val p = planOf(Registry.queries("q_ivf_pruned_knn")(spark, sf0001))
    assert(p.contains("PartitionFilters: [cluster_id"),
      "the persisted-index registry query must partition-prune its scan")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_ivfpq_pruned_knn: persisted codes scan carries PartitionFilters") {
    val p = planOf(Registry.queries("q_ivfpq_pruned_knn")(spark, sf0001))
    assert(p.contains("PartitionFilters: [cluster_id"),
      "probed cluster ids must prune the persisted PQ-codes read")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_opq_ivfpq_knn: rotated persisted codes scan carries PartitionFilters") {
    val p = planOf(Registry.queries("q_opq_ivfpq_knn")(spark, sf0001))
    assert(p.contains("PartitionFilters: [cluster_id"),
      "the OPQ→IVFPQ composition must keep the pruned read path")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_spann_knn: persisted closure index prunes to the probed cells") {
    val p = planOf(Registry.queries("q_spann_knn")(spark, sf0001))
    assert(p.contains("PartitionFilters: [cluster_id"),
      "the SPANN closure read must prune to the probed cell directories — " +
        "replication buys boundary recall, pruning keeps the read small")
    assert(p.contains("BroadcastHashJoin"),
      "the probe set must broadcast against the pruned closure scan")
    assert(!p.contains("SortMergeJoin"))
  }

  test("filtered IVF on a persisted index: partition-pruned AND predicate pushed to parquet") {
    val dir = Files.createTempDirectory("ivffilt").toString
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = IvfIndex.seedCentroids(emb, 8)
    IvfIndex.writeIndex(IvfIndex.assign(emb, cents), cents, dir)
    val (loaded, assignments) = IvfIndex.loadIndex(spark, dir)
    val q = emb.where(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val p = planOf(IvfIndex.searchFiltered(q, loaded, assignments,
      predicate = col("label") < 4, nprobe = 2, k = 5))
    assert(p.contains("LessThan(label,4)"),
      "the IDSelector predicate must push into the inverted-list parquet scan")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_classifier_filter: inference is one map-side projection — no join, no corpus shuffle") {
    val emb = spark.read.parquet(s"$sf0001/documents.parquet")
    val p = planOf(QualityClassifier.score(emb,
      QualityClassifier.syntheticWeights(256), b = 256))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "classifier scoring must stay inside the scan's stage — the broadcast " +
        "weight table is a literal, the fold is per-row")
  }

  test("q_routed_knn: routed shard ids prune the sharded-index scan") {
    val p = planOf(Registry.queries("q_routed_knn")(spark, sf0001))
    assert(p.contains("PartitionFilters: [shard_id"),
      "the routed query's shard_id set must prune the partitioned read — " +
        "the reference's all_shards=False single-shard scan")
    assert(p.contains("BroadcastHashJoin"),
      "the routed request batch must broadcast against the pruned shard scan")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("routed search reads EXACTLY the routed shards' directories (negative gate)") {
    // PartitionFilters in the plan string proves intent; this proves the
    // LISTING: a full scan + post-filter would still pass a string gate,
    // but cannot pass partitionCount == 1 for a 1-shard route.
    // Reference: vector_search_cluster.py:216-221 (all_shards=False).
    import graft.operators.Sharding
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    val dir = Files.createTempDirectory("routedneg").toString
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    Sharding.writeShardedIndex(emb, "embedding", 8, dir)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // plain plan tree
    try {
      spark.catalog.clearCache()
      val q = emb.where(col("vec_id") === 7L)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val df = Sharding.routedSearch(spark, dir, q, 8, k = 5)
      def scans(p: SparkPlan): Seq[FileSourceScanExec] =
        (p +: p.subqueries.toSeq).flatMap(_.collect { case f: FileSourceScanExec => f })
      val shardScans = scans(df.queryExecution.executedPlan)
        .filter(_.relation.partitionSchema.fieldNames.contains("shard_id"))
      assert(shardScans.nonEmpty, "expected a scan over the sharded layout")
      shardScans.foreach { s =>
        assert(s.selectedPartitions.partitionCount == 1,
          s"one routed query must list exactly 1 of 8 shard directories, " +
            s"listed ${s.selectedPartitions.partitionCount}")
      }
      assert(df.count() == 5, "routed search still returns the full top-k")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q_dsir_kl: at most one documents scan across ALL its jobs (tokenize-once)") {
    // The r6 shape re-scanned documents ~8 times (per-stage re-tokenize).
    // Count EVERY SQL execution during query construction+run whose plan
    // scans documents.parquet: only the bucketize checkpoint may. The
    // listener bus is async — poll until the event count is stable.
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    val events = new java.util.concurrent.atomic.AtomicInteger
    val docScanEvents = new java.util.concurrent.atomic.AtomicInteger
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = {
        events.incrementAndGet()
        if (qe.executedPlan.toString.contains("documents.parquet"))
          docScanEvents.incrementAndGet()
      }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Registry.queries("q_dsir_kl")(spark, sf0001).collect()
      var last = -1
      var stableFor = 0
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (stableFor < 3 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        val now = events.get()
        if (now == last && now > 0) stableFor += 1 else { stableFor = 0; last = now }
      }
      assert(events.get() > 0, "listener saw no executions — cannot gate")
      assert(docScanEvents.get() <= 1,
        s"q_dsir_kl must scan documents at most once (the bucketize " +
          s"checkpoint); saw ${docScanEvents.get()} scanning executions")
    } finally spark.listenerManager.unregister(listener)
  }

  test("q_search_lifecycle: one pass over the cache table (no per-consumer re-scan)") {
    // The composed lifecycle feeds the probe to three consumers (hits,
    // miss routing, metrics); without the request-batch checkpoint each
    // consumer would re-plan the cache branch — three embeddings scans
    // in the final plan. Gate: the final executed plan reads embeddings
    // ZERO times (the one cache pass + query-batch scan happened inside
    // the single probe materialization; consumers read the checkpoint)
    // and the sharded index + events exactly once each.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    // AQE wraps the executed plan in AdaptiveSparkPlanExec (scans not
    // reachable by collect until execution) — disable it for the shape
    // check, like the routed-pruning gate above
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = Registry.queries("q_search_lifecycle")(spark, sf0001)
      def scans(p: SparkPlan): Seq[FileSourceScanExec] =
        (p +: p.subqueries.toSeq).flatMap(_.collect { case f: FileSourceScanExec => f })
      def reading(substr: String): Seq[FileSourceScanExec] =
        scans(df.queryExecution.executedPlan).filter(
          _.relation.location.rootPaths.exists(_.toString.contains(substr)))
      assert(reading("embeddings.parquet").isEmpty,
        "final lifecycle plan must read no raw embeddings — every consumer " +
          "reads the single materialized probe (one cache pass by construction)")
      assert(reading("graft_routed_idx").size == 1,
        "exactly one scan of the routed shard layout (D4)")
      assert(reading("events.parquet").size == 1,
        "exactly one events pass for the A5 metrics row")
      assert(df.count() == 20, "all 20 lifecycle queries answered (hits + misses)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("q_hnsw_persisted: search-after-load plans no Sort over the node scan (direct fill)") {
    val p = planOf(Registry.queries("q_hnsw_persisted")(spark, sf0001))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("filtered-persisted graph serving: allow side scans only (vec_id, label) with the predicate pushed; stored nodes cogroup") {
    // the r9-verdict serving shape: the predicate side must be a
    // two-column pruned scan with the label filter pushed into parquet
    // (the embedding vectors ride ONLY in the stored index rows), and
    // the shard dispatch must be a CoGroup of stored nodes with routed
    // allow-ids — no join of the corpus against itself, no broadcast
    // allowed-set, no fresh graph build input from the embeddings table
    Seq("q_hnsw_filtered_knn", "q_vamana_filtered_knn").foreach { q =>
      val p = planOf(Registry.queries(q)(spark, sf0001))
      assert(p.contains("CoGroup"), s"$q must cogroup stored nodes with allow-ids")
      // match the pushed filter and read schema robustly (no dependence
      // on Spark's exact punctuation or filter ordering in the string)
      assert("PushedFilters: \\[[^\\]]*LessThan\\(label,4\\)".r.findFirstIn(p).isDefined,
        s"$q: the allow predicate must reach the embeddings parquet scan")
      val readSchemas = "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
      assert(readSchemas.exists { s =>
        s.contains("vec_id") && s.contains("label") && !s.contains("embedding")
      }, s"$q: the allow side must prune to (vec_id, label) — never read embedding")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), q)
    }
  }

  test("q_event_counters: two-phase aggregation (map-side partial)") {
    val p = planOf(Registry.queries("q_event_counters")(spark, sf0001))
    assert(p.contains("partial_count") || p.contains("Partial"),
      "grouped aggregates must partial-aggregate before the shuffle")
  }

  test("asofJoin: union-window form — no join operator, one key shuffle") {
    import graft.operators.TemporalJoins
    import spark.implicits._
    val probes = Seq((1L, 10L, 1L)).toDF("k", "sec", "probe_id")
      .withColumn("t", timestamp_micros($"sec" * 1000000L)).drop("sec")
    val refs = Seq((1L, 5L, 1.0)).toDF("k", "sec", "v")
      .withColumn("t", timestamp_micros($"sec" * 1000000L)).drop("sec")
    val p = planOf(TemporalJoins.asofJoin(probes, refs, "k", "t", Seq("v")))
    assert(!p.contains("Join"),
      "as-of must resolve via union + running window, not any join")
    val keyShuffles = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(keyShuffles == 1,
      s"exactly one shuffle on the key expected, saw $keyShuffles:\n$p")
  }

  test("q_interval_join: equi-join on (key, bin) — no cartesian/nested-loop pair generation") {
    val p = planOf(Registry.queries("q_interval_join")(spark, sf0001))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "interval join must bin-bucket into an equi-join, never generate all pairs")
  }

  test("hashSplit: pure projection — zero shuffles, zero joins") {
    import graft.operators.CorpusOps
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val p = planOf(CorpusOps.hashSplit(docs, col("doc_id"), 0.8, 0.1))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "split membership must be row-local (recomputable at 100 TB with no shuffle)")
  }

  test("q_sq8_knn: codes table never shuffles — queries broadcast") {
    val p = planOf(Registry.queries("q_sq8_knn")(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query side must broadcast against the codes scan")
    assert(!p.contains("SortMergeJoin"))
  }

  test("heavy hitters recount: candidate In-filter pushed to the parquet scan") {
    import graft.operators.HeavyHitters
    spark.catalog.clearCache()
    val ev = spark.read.parquet(s"$sf0001/events.parquet")
    val df = HeavyHitters.exactAboveThreshold(ev, "user_id", k = 20)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [In(user_id"),
      "pass-2 recount must scan only candidate keys (pushdown), not re-read all rows")
  }

  test("q_bm25: global top-N is TakeOrdered, never a single-partition window") {
    val p = planOf(Registry.queries("q_bm25")(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"),
      "orderBy.limit must plan per-partition top-N + merge")
    assert(!p.contains("WindowExec"), "no window operator in the retrieval path")
  }

  test("q_tfidf: document-frequency side broadcasts") {
    val p = planOf(Registry.queries("q_tfidf")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"),
      "vocab-sized df table must broadcast against the tf side")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_filtered_knn: metadata predicate reaches the candidate parquet scan") {
    val p = planOf(Registry.queries("q_filtered_knn")(spark, sf0001))
    assert(p.contains("LessThan(label,4)"),
      "the label filter must push into the scan — filtered ANN prunes " +
        "candidates before any distance is computed")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("q_semantic_dedup: within-cell equi-join, never all pairs") {
    val p = planOf(Registry.queries("q_semantic_dedup")(spark, sf0001))
    assert(!p.contains("CartesianProduct"),
      "the pair stage must equi-join on cluster_id, never generate all pairs")
  }

  test("semantic dedup pair stage at scale (broadcast off): one shuffle, exchange reused") {
    import graft.operators.SemanticDedup
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      spark.catalog.clearCache()
      val df = SemanticDedup.dupPairs(emb, IvfIndex.seedCentroids(emb, 8), 0.3)
      // AQE only materializes stage reuse in the FINAL plan, and only for
      // THIS QueryExecution — collect() drives it (count() would plan anew)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // when neither side can broadcast (the 100 TB regime), both sides are
      // the SAME assignment subplan shuffled on cluster_id — Spark must
      // compute the shuffle once and reuse it
      assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
        s"self-join sides must share one exchange:\n$p")
      assert(!p.contains("CartesianProduct"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_range_search: broadcast queries, no window, no sort-merge join") {
    val p = planOf(Registry.queries("q_range_search")(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("WindowExec") && !p.contains("SortMergeJoin"))
  }

  test("bucketed tables co-locate: same-bucket join plans with no shuffle") {
    val wh = Files.createTempDirectory("bucketwh").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      emb.write.format("parquet")
        .option("path", s"$wh/emb_a").bucketBy(8, "vec_id")
        .saveAsTable("graft_bucket_a")
      emb.select(col("vec_id"), col("embedding").as("emb2")).write.format("parquet")
        .option("path", s"$wh/emb_b").bucketBy(8, "vec_id")
        .saveAsTable("graft_bucket_b")
      val joined = spark.table("graft_bucket_a")
        .join(spark.table("graft_bucket_b"), "vec_id")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        "matching bucket spec must make the join shuffle-free:\n" + p)
      assert(joined.count() == emb.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("q_hard_negatives: label predicate stays map-side — broadcast + WindowGroupLimit, no extra shuffle") {
    val p = planOf(Registry.queries("q_hard_negatives")(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query side must broadcast")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial") && p.contains("Final"),
      "top-k must partial-limit per partition before the final merge")
    assert(!p.contains("SortMergeJoin"), "no big-big shuffle join")
  }

  test("q_knn_classify: corpus stage is the FLAT plan; vote argmax only sees Q*k rows") {
    val p = planOf(Registry.queries("q_knn_classify")(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("WindowGroupLimit"),
      "neighbor top-k must be heap-bounded before the vote aggregate")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_maxsim_knn: late-interaction scoring is map-side — broadcast + WindowGroupLimit") {
    val p = planOf(Registry.queries("q_maxsim_knn")(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("WindowGroupLimit") && p.contains("Partial") && p.contains("Final"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_rotated_knn: rotation is a pure projection — no shuffle before the top-k window") {
    val p = planOf(Registry.queries("q_rotated_knn")(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "rotated query side must broadcast")
    assert(!p.contains("SortMergeJoin"))
    // exactly two Exchanges — the per-query top-k hash shuffle and the
    // ordered-output range shuffle every oracle query ends with; the
    // MatVec rotation itself must not repartition anything
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).length
    assert(exchanges <= 2, s"rotation path must add no shuffle, saw $exchanges:\n$p")
    assert(p.contains("matvec"), "rotation must plan as the fused map-side projection")
  }

  test("q_dsir_select: scoring is map-side, selection is TakeOrdered — the corpus never shuffles") {
    val p = planOf(Registry.queries("q_dsir_select")(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"),
      "Gumbel top-k must plan as TakeOrdered (per-partition heap + k-row " +
        "driver merge), not a global sort")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the ratio map is a plan literal — no join at all in the scoring path")
    // the only Exchange allowed is the k-row single-partition one feeding
    // the post-limit rank window — nothing corpus-sized may shuffle
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"scoring must stay map-side, saw $exchanges exchanges:\n$p")
  }

  test("q_bpe_encode: vocabulary dictionary broadcasts; the occurrence stream never sort-merges") {
    val p = planOf(Registry.queries("q_bpe_encode")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"),
      "the word-type dictionary must broadcast onto the occurrence stream")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_weighted_sample: selection is TakeOrdered, scoring map-side — no corpus sort or join") {
    val p = planOf(Registry.queries("q_weighted_sample")(spark, sf0001))
    assert(p.contains("TakeOrderedAndProject"),
      "A-ES top-k must plan as TakeOrdered, not a global sort")
    assert(!p.contains("Join"), "scoring is a pure projection — no join")
  }

  test("q_stupid_backoff: both LM count tables broadcast; the doc stream never sort-merges") {
    val p = planOf(Registry.queries("q_stupid_backoff")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"),
      "vocab-sized bigram/unigram tables must broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_mlm_mask: vocabulary index broadcasts onto the selected positions") {
    val p = planOf(Registry.queries("q_mlm_mask")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"),
      "the sorted vocab index must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q_hll_distinct: register aggregation partial-combines map-side") {
    val p = planOf(Registry.queries("q_hll_distinct")(spark, sf0001))
    assert(p.contains("partial_max"),
      "per-bucket max(rho) must partial-aggregate before the shuffle — " +
        "the exchange carries registers, never keys")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q_vamana_knn: shard-local top-k partial-limits before the final merge") {
    val p = planOf(Registry.queries("q_vamana_knn")(spark, sf0001))
    assert(p.contains("WindowGroupLimit") && p.contains("Partial") && p.contains("Final"),
      "A1 merge over the per-shard graph results must partial-limit")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q_kn_bigram: all four KN model tables broadcast; the doc stream never sort-merges") {
    val p = planOf(Registry.queries("q_kn_bigram")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"),
      "unigram/bigram/continuation tables must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q_decontaminate_semantic: eval side broadcasts, partial max before the shuffle") {
    val p = planOf(Registry.queries("q_decontaminate_semantic")(spark, sf0001))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the eval slice must broadcast — the corpus side must not shuffle vectors")
    assert(p.contains("partial_max"),
      "per-row max must partial-aggregate map-side — the exchange carries " +
        "one slim (id, max) row per corpus row, never the fan-out")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
  }

  test("q_collocations: count tables broadcast, selection is TakeOrdered") {
    val p = planOf(Registry.queries("q_collocations")(spark, sf0001))
    assert(p.contains("BroadcastHashJoin"),
      "unigram marginals must broadcast onto the bigram table")
    assert(p.contains("TakeOrderedAndProject"),
      "top-N must be per-partition heap + merge, not a global sort")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("TA random access is an equi semi-join over the candidate prefix (no plan-level blowup)") {
    val idx = graft.operators.SparseTopK
      .buildImpactIndex(spark.read.parquet(s"$sf0001/documents.parquet"))
      .localCheckpoint(true)
    val p = planOf(graft.operators.SparseTopK.taTopK(idx, Seq("vector", "spark"), 5))
    // the candidate set is only broadcast-sized when pruning bites (at
    // exhaustion it is every matching doc), so the static plan keeps an
    // equi LeftSemi and AQE picks broadcast at runtime — the gate is
    // that it IS an equi semi-join (never a nested-loop/cartesian pair
    // generation) and the scoring ends in TakeOrdered
    assert(p.contains("LeftSemi"), "candidate restriction must be a semi-join")
    // (rankBounded's final <=k-row ranking is a bounded BNLJ by design,
    // so only the cartesian form is categorically banned here)
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k selection must be per-partition heap + merge")
    // the final ranking is the window-free rankBounded form
    assert(!p.contains("WindowExec"), "TA output ranking must stay window-free")
  }

  test("q_ta_persisted: bucket partitions prune, term filter pushes into the SERVE plan's scan") {
    // r15 (r14 verdict item 6): below the checkpoint floor the serve
    // reads the bucket-pruned parquet DIRECTLY — no materialization job
    // — so the pruning/pushdown contract is visible in the served plan
    // itself instead of hiding behind an ExistingRDD checkpoint (the
    // r14 dossier gap). Working sets ≥ CheckpointFloorPostings still
    // checkpoint (the 1000×-docs re-scan killer); the floor-forced
    // equality test in SparseTopKSpec pins the two shapes row-identical.
    val p = planOf(Registry.queries("q_ta_persisted")(spark, sf0001))
    assert(p.contains("PartitionFilters") && p.contains("bucket"),
      "query terms' hash buckets must prune the partitioned index read " +
        "in the serve plan itself")
    assert(p.contains("PushedFilters") && p.contains("In(term"),
      "the term predicate must reach the parquet scan in the serve plan")
  }
}
