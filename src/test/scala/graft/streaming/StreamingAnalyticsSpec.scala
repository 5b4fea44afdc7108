package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.streaming.StreamingAnalytics.{Heartbeat, NodeState}

class StreamingAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumblingCounts aggregates a drained stream like the batch analog") {
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, Timestamp, String, Double)]
    val df = src.toDF().toDF("event_id", "ts", "event_type", "value")
    src.addData(
      (1L, ts("2024-01-01 00:00:10"), "click", 10.0),
      (2L, ts("2024-01-01 00:01:00"), "click", 20.0),
      (3L, ts("2024-01-01 00:06:00"), "error", 5.0))
    StreamingAnalytics.runToMemory(
      StreamingAnalytics.tumblingCounts(df, "5 minutes", "10 minutes"),
      "tumbling_out", OutputMode.Update)
    val rows = spark.table("tumbling_out")
      .orderBy($"window_start", $"event_type").collect()
    assert(rows.length == 2)
    assert(rows.head.getAs[Long]("n_events") == 2)
    assert(rows.head.getAs[Double]("sum_value") == 30.0)
  }

  test("updateNodeState: accumulation, running average, timeout → dead") {
    import org.apache.spark.sql.streaming.TestGroupState
    val fn = StreamingAnalytics.updateNodeState(60000) _
    // batch 1: two beats
    var state = TestGroupState.create[NodeState](
      optionalState = org.apache.spark.api.java.Optional.empty[NodeState](), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val s1 = fn("n1", Iterator(
      Heartbeat("n1", ts("2024-01-01 00:00:00"), 10.0),
      Heartbeat("n1", ts("2024-01-01 00:00:05"), 30.0)), state)
    assert(s1.nHeartbeats == 2 && s1.avgLatencyMs == 20.0 && s1.health == "healthy")
    // batch 2: one more beat, running average updates
    state = TestGroupState.create[NodeState](
      optionalState = org.apache.spark.api.java.Optional.of(s1), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 2000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = false)
    val s2 = fn("n1", Iterator(Heartbeat("n1", ts("2024-01-01 00:00:10"), 20.0)), state)
    assert(s2.nHeartbeats == 3 && math.abs(s2.avgLatencyMs - 20.0) < 1e-9)
    assert(s2.lastHeartbeatMs == ts("2024-01-01 00:00:10").getTime)
    // timeout: node flips to dead and state clears (the expiry the
    // reference lacks, vector_search_cluster.py:149-161)
    state = TestGroupState.create[NodeState](
      optionalState = org.apache.spark.api.java.Optional.of(s2), timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 120000L, eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](), hasTimedOut = true)
    val s3 = fn("n1", Iterator.empty, state)
    assert(s3.health == "dead")
    assert(state.isRemoved)
  }

  test("end-to-end: silent node flips to dead via state timeout (integration)") {
    // Drives nodeHealth as a real streaming query against a MemoryStream
    // at the reference's heartbeat cadence shape (Trigger.ProcessingTime,
    // vector_search_cluster.py:757): node a heartbeats once, goes silent
    // past the timeout, node b's later beat triggers the batch in which
    // a's state times out → "dead" row. Polling with a deadline instead
    // of processAllAvailable — ProcessingTimeTimeout schedules extra
    // batches that make processAllAvailable unreliable here.
    implicit val sc = spark.sqlContext
    val src = MemoryStream[Heartbeat]
    val out = StreamingAnalytics.nodeHealth(src.toDS(), timeoutMs = 1500)
    val q = out.toDF().writeStream.outputMode(OutputMode.Update)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .format("memory").queryName("nh_e2e").start()
    try {
      def countWhere(cond: org.apache.spark.sql.Column): Long =
        spark.table("nh_e2e").where(cond).count()
      def awaitAtLeast(cond: org.apache.spark.sql.Column, n: Long, deadlineMs: Long): Boolean = {
        val end = System.currentTimeMillis() + deadlineMs
        while (countWhere(cond) < n && System.currentTimeMillis() < end) Thread.sleep(200)
        countWhere(cond) >= n
      }
      src.addData(Heartbeat("a", ts("2024-01-01 00:00:00"), 12.0))
      assert(awaitAtLeast($"nodeId" === "a" && $"health" === "healthy", 1, 30000),
        "node a never reported healthy")
      Thread.sleep(2500) // exceed the 1.5 s state timeout while a is silent
      src.addData(Heartbeat("b", ts("2024-01-01 00:00:10"), 5.0))
      assert(awaitAtLeast($"nodeId" === "a" && $"health" === "dead", 1, 30000),
        "node a never flipped to dead after timeout")
      assert(countWhere($"nodeId" === "b" && $"health" === "dead") == 0)
    } finally q.stop()
  }

  test("decayedCountsLoop: streaming state equals the batch operator at the same reference") {
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(String, Long)]
    val out = StreamingAnalytics.decayedCountsLoop(src.toDS(), halfLifeSeconds = 3600.0)
    val q = out.toDF().writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName("decay_loop").start()
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    try {
      // two batches split mid-key: the decay fold must re-associate cleanly
      src.addData(("click", base), ("click", base + 1800L * 1000000L), ("view", base))
      q.processAllAvailable()
      src.addData(("click", base + 3600L * 1000000L), ("view", base + 7200L * 1000000L))
      q.processAllAvailable()
      val snaps = spark.table("decay_loop")
        .orderBy($"anchorUs".desc)
        .collect()
        .groupBy(_.getAs[String]("eventType"))
        .map { case (k, rows) => k -> rows.head } // latest snapshot per key
      // batch reference: the GLOBAL max ts; re-decay each key's snapshot
      // from its own anchor to the global reference before comparing
      val refUs = snaps.values.map(_.getAs[Long]("anchorUs")).max
      val lambda = math.log(2.0) / 3600.0
      val streamed = snaps.map { case (k, r) =>
        k -> (r.getAs[Long]("nEvents"),
          r.getAs[Double]("decayed") *
            math.exp(-lambda * ((refUs - r.getAs[Long]("anchorUs")).toDouble / 1e6)))
      }
      val batchDf = Seq(
        ("click", base), ("click", base + 1800L * 1000000L), ("view", base),
        ("click", base + 3600L * 1000000L), ("view", base + 7200L * 1000000L))
        .toDF("event_type", "us")
        .select($"event_type",
          org.apache.spark.sql.functions.timestamp_micros($"us").as("ts"))
      val batch = graft.operators.MetricsAnalytics.decayedCounts(batchDf, 3600.0)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (k, (n, d)) =>
        assert(n == batch(k)._1, s"$k event count")
        assert(math.abs(d - batch(k)._2) < 1e-6,
          s"$k decayed: streaming $d vs batch ${batch(k)._2}")
      }
    } finally q.stop()
  }

  test("cacheServeLoop: first batch misses and populates; repeat hits with the same payload; TTL expiry re-misses") {
    implicit val sc = spark.sqlContext
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val queries = emb.where($"vec_id" < 4)
      .select($"vec_id".as("query_id"),
        graft.operators.CacheSemantics.keyFor($"embedding", 5).as("cache_key"),
        $"embedding".as("qvec"))
      .as[(Long, String, Array[Float])].collect().toSeq
    val dir = java.nio.file.Files.createTempDirectory("cacheserve").toString
    val src = MemoryStream[(Long, String, Array[Float])]
    var now = 1000L
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Boolean, String)]]
    val q = StreamingAnalytics.cacheServeLoop(
      src.toDF().toDF("query_id", "cache_key", "qvec"), emb, dir,
      k = 5, ttlSeconds = 300L, clock = () => now) { (df, _) =>
      batches += df.select($"query_id", $"hit", $"payload").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq.sortBy(_._1)
    }
    try {
      src.addData(queries); q.processAllAvailable()   // all miss, cache fills
      src.addData(queries); q.processAllAvailable()   // all hit, same payloads
      now = 1400L                                     // past expires_at = 1300
      src.addData(queries.take(2)); q.processAllAvailable() // expired → re-miss
    } finally q.stop()
    assert(batches.size == 3)
    assert(batches(0).forall(!_._2), "first batch must be all misses")
    assert(batches(1).forall(_._2), "second batch must be all cache hits")
    assert(batches(0).map(r => (r._1, r._3)) == batches(1).map(r => (r._1, r._3)),
      "hit payloads must be exactly the miss-computed payloads")
    assert(batches(2).forall(!_._2), "expired entries must re-miss")
    assert(batches(2).map(r => (r._1, r._3)) ==
      batches(0).take(2).map(r => (r._1, r._3)),
      "recomputed payloads must be deterministic")
    // payload parity with the batch engine's serialization (md5 of
    // rank-ordered ids from the same topK)
    val expect = graft.operators.KnnSearch.topK(
        emb.where($"vec_id" < 4).select($"vec_id".as("query_id"), $"embedding".as("qvec")),
        emb.select($"vec_id", $"embedding".as("vec")), k = 5)
      .groupBy($"query_id")
      .agg(md5(concat_ws(",",
        transform(array_sort(collect_list(struct($"rank", $"vec_id"))),
          x => x.getField("vec_id").cast("string")))).as("payload"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(batches(0).map(r => (r._1, r._3)) == expect)
  }

  // shared shape for the cache-serve tests below: (query_id, cache_key, qvec)
  private def cacheQueries(ids: Long*): Seq[(Long, String, Array[Float])] = {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    emb.where($"vec_id".isin(ids: _*))
      .select($"vec_id".as("query_id"),
        graft.operators.CacheSemantics.keyFor($"embedding", 5).as("cache_key"),
        $"embedding".as("qvec"))
      .as[(Long, String, Array[Float])].collect().toSeq
      .sortBy(q => ids.indexOf(q._1))
  }

  test("cacheServeLoop: compaction folds the tail into a versioned snapshot; reads stay bounded by live keys; payloads survive compaction") {
    implicit val sc = spark.sqlContext
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("cachecompact").toString
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def dataFiles = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/data")
      if (fs.exists(p)) fs.listStatus(p).length else 0
    }
    val src = MemoryStream[(Long, String, Array[Float])]
    val now = 1000L
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Boolean, String)]]
    val q = StreamingAnalytics.cacheServeLoop(
      src.toDF().toDF("query_id", "cache_key", "qvec"), emb, dir,
      k = 5, ttlSeconds = 10000L, clock = () => now,
      compactEvery = 2, capacity = 100) { (df, _) =>
      batches += df.select($"query_id", $"hit", $"payload").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq.sortBy(_._1)
    }
    try {
      src.addData(cacheQueries(0L, 1L)); q.processAllAvailable()   // b0: miss, tail grows
      assert(dataFiles > 0, "append tail must exist before compaction")
      src.addData(cacheQueries(2L, 3L)); q.processAllAvailable()   // b1: miss + COMPACT
      assert(dataFiles == 0, "compaction must delete the folded tail files")
      assert(graft.sources.IndexVersions.latest(spark, s"$dir/snapshot").contains(1L))
      // an uncompacted loop would keep every SETEX row ever written; the
      // snapshot holds exactly the live keys
      val snap1 = spark.read.parquet(
        graft.sources.IndexVersions.latestPath(spark, s"$dir/snapshot").get)
      assert(snap1.count() == 4)
      src.addData(cacheQueries(0L, 1L, 2L, 3L)); q.processAllAvailable() // b2: all HIT from snapshot
      src.addData(cacheQueries(4L)); q.processAllAvailable()        // b3: miss + COMPACT again
      assert(dataFiles == 0)
      val snap2 = spark.read.parquet(
        graft.sources.IndexVersions.latestPath(spark, s"$dir/snapshot").get)
      assert(snap2.count() == 5, "snapshot row count == live keys, flat in history")
    } finally q.stop()
    assert(batches.size == 4)
    assert(batches(0).forall(!_._2) && batches(1).forall(!_._2))
    assert(batches(2).forall(_._2), "post-compaction batch must hit from the snapshot")
    // hit payloads across the compaction boundary == the miss-computed ones
    val fresh = (batches(0) ++ batches(1)).map(r => r._1 -> r._3).toMap
    batches(2).foreach { case (id, _, p) => assert(p == fresh(id)) }
  }

  test("cacheServeLoop: compaction enforces capacity — oldest live keys evict and re-miss") {
    implicit val sc = spark.sqlContext
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("cachecap").toString
    val src = MemoryStream[(Long, String, Array[Float])]
    var now = 1000L
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Boolean, String)]]
    val q = StreamingAnalytics.cacheServeLoop(
      src.toDF().toDF("query_id", "cache_key", "qvec"), emb, dir,
      k = 5, ttlSeconds = 100000L, clock = () => now,
      compactEvery = 2, capacity = 2) { (df, _) =>
      batches += df.select($"query_id", $"hit", $"payload").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq.sortBy(_._1)
    }
    try {
      src.addData(cacheQueries(0L)); q.processAllAvailable(); now = 2000L // b0
      src.addData(cacheQueries(1L)); q.processAllAvailable(); now = 3000L // b1 + compact: {0,1} kept
      src.addData(cacheQueries(2L)); q.processAllAvailable(); now = 4000L // b2
      src.addData(cacheQueries(3L)); q.processAllAvailable(); now = 4100L // b3 + compact: keep {2,3}
      src.addData(cacheQueries(0L, 3L)); q.processAllAvailable()          // b4
    } finally q.stop()
    assert(batches.size == 5)
    val b4 = batches(4).map(r => r._1 -> r._2).toMap
    assert(!b4(0L), "key 0 was evicted by capacity (still within TTL) — must re-miss")
    assert(b4(3L), "key 3 is among the capacity most-recent — must hit")
    assert(batches(4).find(_._1 == 0L).get._3 == batches(0).head._3,
      "re-computed payload must equal the original")
  }

  test("cacheServeLoop: an all-hit batch (the replay shape) never executes the corpus scan") {
    implicit val sc = spark.sqlContext
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val embDir = java.nio.file.Files.createTempDirectory("embcopy").toString
    emb.write.mode("overwrite").parquet(embDir)
    val embLazy = spark.read.schema(emb.schema).parquet(embDir)
    val dir = java.nio.file.Files.createTempDirectory("cachereplay").toString
    val src = MemoryStream[(Long, String, Array[Float])]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Boolean, String)]]
    val q = StreamingAnalytics.cacheServeLoop(
      src.toDF().toDF("query_id", "cache_key", "qvec"), embLazy, dir,
      k = 5, ttlSeconds = 10000L, clock = () => 1000L) { (df, _) =>
      batches += df.select($"query_id", $"hit", $"payload").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq.sortBy(_._1)
    }
    try {
      src.addData(cacheQueries(0L, 1L)); q.processAllAvailable() // b0: misses scan the corpus
      // delete the corpus files: any subsequent execution of the k-NN
      // subtree would fail the stream with FileNotFound
      val fs = new org.apache.hadoop.fs.Path(embDir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(embDir), true)
      assertThrows[Exception](embLazy.count()) // the deletion is real
      src.addData(cacheQueries(0L, 1L)); q.processAllAvailable() // b1: all hit, no scan
    } finally q.stop()
    assert(batches.size == 2)
    assert(batches(0).forall(!_._2) && batches(1).forall(_._2))
    assert(batches(0).map(r => (r._1, r._3)) == batches(1).map(r => (r._1, r._3)))
  }

  test("cacheServeLoop: two misses sharing a cache_key serve one row per query_id (no m×m key join)") {
    implicit val sc = spark.sqlContext
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val one = cacheQueries(0L).head
    val dup = Seq((100L, one._2, one._3), (101L, one._2, one._3)) // same key, two requests
    val dir = java.nio.file.Files.createTempDirectory("cachedup").toString
    val src = MemoryStream[(Long, String, Array[Float])]
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Boolean, String)]]
    val q = StreamingAnalytics.cacheServeLoop(
      src.toDF().toDF("query_id", "cache_key", "qvec"), emb, dir,
      k = 5, ttlSeconds = 10000L, clock = () => 1000L) { (df, _) =>
      batches += df.select($"query_id", $"hit", $"payload").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSeq.sortBy(_._1)
    }
    try {
      src.addData(dup); q.processAllAvailable()
    } finally q.stop()
    assert(batches.size == 1)
    assert(batches(0).map(_._1) == Seq(100L, 101L),
      s"exactly one served row per query_id, got ${batches(0).map(_._1)}")
    assert(batches(0).map(_._3).distinct.size == 1, "identical vectors, identical payloads")
  }

  test("knnServeLoop: streamed queries get the same top-k as the batch engine") {
    implicit val sc = spark.sqlContext
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val queries = emb.where($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
      .as[(Long, Array[Float])].collect()
    val src = MemoryStream[(Long, Array[Float])]
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long)]()
    val q = StreamingAnalytics.knnServeLoop(
      src.toDF().toDF("query_id", "qvec"), emb, k = 5) { (df, _) =>
      df.collect().foreach(r => results.add(
        (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("vec_id"))))
    }
    try {
      src.addData(queries.take(2).toSeq)
      q.processAllAvailable()
      src.addData(queries.drop(2).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    // the serve loop does not exclude self — compare to topK on the same queries
    val expect = graft.operators.KnnSearch.topK(
      emb.where($"vec_id" < 4).select($"vec_id".as("query_id"), $"embedding".as("qvec")),
      emb.select($"vec_id", $"embedding".as("vec")), k = 5)
      .select($"query_id", $"rank", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(results.size == expect.size)
    assert(results.toArray(Array.empty[(Long, Long, Long)]).toSet == expect)
  }

  test("indexIngestLoop: streamed adds land in the persisted index; pruned search sees them") {
    import graft.operators.IvfIndex
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ivfingest").toString
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val base = emb.where($"vec_id" < 400)
    val cents = IvfIndex.seedCentroids(emb, 8)
    IvfIndex.writeIndex(IvfIndex.assign(base, cents), cents, dir)

    val arrivals = emb.where($"vec_id" >= 400)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val src = MemoryStream[(Long, Array[Float])]
    val q = StreamingAnalytics.indexIngestLoop(
      src.toDF().toDF("vec_id", "embedding"), cents, dir)
    try {
      src.addData(arrivals.take(50).toSeq)
      q.processAllAvailable()
      src.addData(arrivals.drop(50).toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val (loaded, assignments) = IvfIndex.loadIndex(spark, dir)
    assert(assignments.count() == emb.count(), "all adds must land")
    // the streamed-in rows are searchable through the pruned path: a
    // query ON an added vector must find itself at rank 1, dist 0 — and
    // ingestion must not have cost the read path its partition pruning
    val probe = emb.where($"vec_id" === 450)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val pruned = IvfIndex.searchPruned(probe, loaded, assignments, nprobe = 2, k = 3)
    assert(pruned.queryExecution.executedPlan.toString
        .contains("PartitionFilters: [cluster_id"),
      "pruned search over the ingested index must still carry PartitionFilters")
    val top = pruned.orderBy($"rank").collect()
    assert(top.nonEmpty && top.head.getAs[Long]("vec_id") == 450L
      && top.head.getAs[Double]("dist") == 0.0)

    // replay safety: a restarted query re-delivers the same batch ids
    // with the same data; the _batches markers must make the appends
    // no-ops instead of duplicating the index
    val src2 = MemoryStream[(Long, Array[Float])]
    val q2 = StreamingAnalytics.indexIngestLoop(
      src2.toDF().toDF("vec_id", "embedding"), cents, dir)
    try {
      src2.addData(arrivals.take(50).toSeq) // replays as batchId 0
      q2.processAllAvailable()
      src2.addData(arrivals.drop(50).toSeq) // replays as batchId 1
      q2.processAllAvailable()
    } finally q2.stop()
    assert(IvfIndex.loadIndex(spark, dir)._2.count() == emb.count(),
      "replayed batches must be skipped by the batch markers, not re-appended")
  }

  test("hnswServeLoop: streamed queries against a persisted index match the batch path") {
    import graft.operators.HnswIndex
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("hnswserve").toString
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    HnswIndex.writeIndex(emb, dir, numPartitions = 4)
    val queries = emb.where($"vec_id" < 4)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val src = MemoryStream[(Long, Array[Float])]
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = StreamingAnalytics.hnswServeLoop(
      src.toDF().toDF("query_id", "qvec"), dir, k = 5) { (df, _) =>
      df.collect().foreach(r => results.add(r.toString))
    }
    try {
      src.addData(queries.take(2).toSeq)
      q.processAllAvailable()
      src.addData(queries.drop(2).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    val expect = HnswIndex.searchPersisted(
      emb.where($"vec_id" < 4)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec")),
      dir, k = 5).collect().map(_.toString).toSet
    assert(results.toArray(Array.empty[String]).toSet == expect)
  }

  test("hnswServeLoopVersioned: publish-during-serve, crashed publish never served, rollback round") {
    import graft.operators.HnswIndex
    import graft.sources.IndexVersions
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("hnswversioned").toString
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    // v1: small corpus; v2 (published mid-stream): full corpus
    IndexVersions.publish(spark, root)(p =>
      HnswIndex.writeIndex(emb.where($"vec_id" < 100), p, numPartitions = 4))
    val queries = emb.where($"vec_id" < 2)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val servedVersions = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Set[String])]()
    val src = MemoryStream[(Long, Array[Float])]
    val q = StreamingAnalytics.hnswServeLoopVersioned(
      src.toDF().toDF("query_id", "qvec"), root, k = 5) { (df, _, v) =>
      servedVersions.add(v)
      results.add(v -> df.collect().map(_.toString).toSet)
    }
    try {
      // batch 1: old version serves until the flip
      src.addData(queries.toSeq)
      q.processAllAvailable()
      // a crashed publish: full version directory, no pointer flip —
      // must remain invisible to the serving loop
      HnswIndex.writeIndex(emb, s"$root/v_7", numPartitions = 4)
      src.addData(queries.toSeq)
      q.processAllAvailable()
      // real publish mid-stream: next batch serves v2 with no restart
      IndexVersions.publish(spark, root)(p =>
        HnswIndex.writeIndex(emb, p, numPartitions = 4))
      src.addData(queries.toSeq)
      q.processAllAvailable()
      // rollback round: one pointer write back to v1
      IndexVersions.setPointer(spark, root, 1L)
      src.addData(queries.toSeq)
      q.processAllAvailable()
    } finally q.stop()
    assert(servedVersions.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
      == Seq(1L, 1L, 8L, 1L),
      s"served versions must be v1, v1 (crashed v7 invisible), v8, v1-rollback: $servedVersions")
    // the served rows themselves flip with the version: v8 (full corpus)
    // answers differ from v1 (100-vector corpus) for these queries
    val byVersion = results.toArray(Array.empty[(Long, Set[String])]).groupBy(_._1)
    assert(byVersion(1L).map(_._2).toSet.size == 1, "v1 batches identical")
    assert(byVersion(1L).head._2 != byVersion(8L).head._2,
      "the published rebuild must actually change the served answers")
  }

  test("hnswIngestLoop: streamed adds grow the persisted graphs; search sees them") {
    import graft.operators.HnswIndex
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("hnswingest").toString
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    HnswIndex.writeIndex(emb.where($"vec_id" < 400), dir, numPartitions = 4)

    val arrivals = emb.where($"vec_id" >= 400)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val src = MemoryStream[(Long, Array[Float])]
    val q = StreamingAnalytics.hnswIngestLoop(
      src.toDF().toDF("vec_id", "embedding"), dir)
    try {
      src.addData(arrivals.take(50).toSeq)
      q.processAllAvailable()
      src.addData(arrivals.drop(50).toSeq)
      q.processAllAvailable()
    } finally q.stop()

    val res = HnswIndex.selfSearchPersisted(spark, dir, numQueries = 450, k = 1)
    // query 449 (base) and 400..449 (streamed) all answer; every
    // streamed-in id is now a searchable graph node
    assert(res.select($"query_id").distinct().count() == 450)

    // replay: a restarted stream re-delivers the same batch ids — markers
    // must keep the graphs unchanged
    val before = HnswIndex.selfSearchPersisted(spark, dir, numQueries = 8, k = 5)
      .collect().map(_.toString).toSeq
    val src2 = MemoryStream[(Long, Array[Float])]
    val q2 = StreamingAnalytics.hnswIngestLoop(
      src2.toDF().toDF("vec_id", "embedding"), dir)
    try {
      src2.addData(arrivals.take(50).toSeq)
      q2.processAllAvailable()
    } finally q2.stop()
    val after = HnswIndex.selfSearchPersisted(spark, dir, numQueries = 8, k = 5)
      .collect().map(_.toString).toSeq
    assert(after == before, "replayed batch must not mutate the graphs")
  }

  test("streamingExactDedup keeps first arrival per content hash") {
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, Timestamp, String)]
    val df = src.toDF().toDF("doc_id", "ts", "text")
    src.addData(
      (1L, ts("2024-01-01 00:00:01"), "same text"),
      (2L, ts("2024-01-01 00:00:02"), "same text"),
      (3L, ts("2024-01-01 00:00:03"), "other text"))
    StreamingAnalytics.runToMemory(
      StreamingAnalytics.streamingExactDedup(df, "10 minutes"),
      "dedup_out", OutputMode.Append)
    val ids = spark.table("dedup_out")
      .select($"doc_id").as[Long].collect().sorted
    // one survivor per distinct text; doc 2 is the in-window duplicate
    assert(ids.length == 2)
    assert(!ids.contains(2L))
  }

  test("streamingIntervalJoin pairs events with containing anchor windows") {
    implicit val sc = spark.sqlContext
    val eSrc = MemoryStream[(Long, Long, Timestamp)]
    val aSrc = MemoryStream[(Long, Long, Timestamp)]
    val e = eSrc.toDF().toDF("event_id", "k", "ts")
    val a = aSrc.toDF().toDF("aid", "k", "ts")
    aSrc.addData(
      (100L, 1L, ts("2024-01-01 00:00:30")),  // window [00:30, 01:00)
      (101L, 2L, ts("2024-01-01 00:00:00")))
    eSrc.addData(
      (1L, 1L, ts("2024-01-01 00:00:45")), // inside 100's window
      (2L, 1L, ts("2024-01-01 00:01:10")), // after 100's window → no match
      (3L, 2L, ts("2024-01-01 00:00:29")), // inside 101's window
      (4L, 1L, ts("2024-01-01 00:00:10"))) // before 100's window → no match
    StreamingAnalytics.runToMemory(
      StreamingAnalytics.streamingIntervalJoin(e, a, "k", "aid",
        lenSec = 30L, watermark = "10 minutes"),
      "sij_out", OutputMode.Append)
    val pairs = spark.table("sij_out")
      .select($"_anchor_id", $"event_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 1L), (101L, 3L)))
  }

  test("asofEnrichLoop matches the batch asofJoin per micro-batch") {
    implicit val sc = spark.sqlContext
    val refs = Seq((1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:05:00"), 2.0))
      .toDF("k", "t", "v")
    val src = MemoryStream[(Long, Long, Timestamp)]
    val probes = src.toDF().toDF("probe_id", "k", "t")
    src.addData(
      (10L, 1L, ts("2024-01-01 00:03:00")),  // latest prior ref: v=1.0
      (11L, 1L, ts("2024-01-01 00:06:00")))  // latest prior ref: v=2.0
    val got = scala.collection.mutable.Map.empty[Long, Double]
    val q = StreamingAnalytics.asofEnrichLoop(probes, refs, "k", "t", Seq("v")) {
      (out, _) =>
        out.select($"probe_id", $"asof_v").collect()
          .foreach(r => got(r.getLong(0)) = r.getDouble(1))
    }
    q.processAllAvailable(); q.stop()
    assert(got == Map(10L -> 1.0, 11L -> 2.0))
  }

  test("session_window works as a streaming aggregation (gap sessions)") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions.{col, count, lit, session_window}
    val src = MemoryStream[(Long, Long, Timestamp)]
    val df = src.toDF().toDF("event_id", "user_id", "ts")
    val sessions = df
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
    // Append mode: a session emits once the watermark passes its end —
    // drive the watermark forward with a later sentinel batch
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sw_out").start()
    src.addData(
      (1L, 7L, ts("2024-01-01 00:00:00")),
      (2L, 7L, ts("2024-01-01 00:10:00")),  // within 30 min → same session
      (3L, 7L, ts("2024-01-01 01:00:00")))  // 50 min gap → new session
    q.processAllAvailable()
    src.addData((99L, 8L, ts("2024-01-01 06:00:00"))) // watermark → 05:50
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sw_out")
      .where(col("user_id") === 7L)
      .select(col("n_events")).collect().map(_.getLong(0)).sorted
    assert(rows.toSeq == Seq(1L, 2L))
  }

  test("slidingMean emits overlapping windows") {
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, Timestamp, String, Double)]
    val df = src.toDF().toDF("event_id", "ts", "event_type", "value")
    src.addData((1L, ts("2024-01-01 00:03:00"), "click", 10.0))
    StreamingAnalytics.runToMemory(
      StreamingAnalytics.slidingMean(df, "10 minutes", "5 minutes", "10 minutes"),
      "sliding_out", OutputMode.Update)
    // one event falls into two overlapping 10-min windows sliding by 5
    assert(spark.table("sliding_out").count() == 2)
  }

  test("vamanaIngestLoop: streamed adds grow the persisted shards; replay is a no-op") {
    import graft.operators.VamanaIndex
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("vamanaingest").toString
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    VamanaIndex.writeIndex(emb.where($"vec_id" < 400), dir, numPartitions = 4)

    val arrivals = emb.where($"vec_id" >= 400)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val src = MemoryStream[(Long, Array[Float])]
    val q = StreamingAnalytics.vamanaIngestLoop(
      src.toDF().toDF("vec_id", "embedding"), dir)
    try {
      src.addData(arrivals.take(50).toSeq)
      q.processAllAvailable()
      src.addData(arrivals.drop(50).toSeq)
      q.processAllAvailable()
    } finally q.stop()

    // every streamed-in vector is a searchable node: it finds itself
    val probe = emb.where($"vec_id" >= 400)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val served = VamanaIndex.searchPersisted(probe, dir, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(served.length == arrivals.length)
    assert(served.forall { case (qid, vid, d) => qid == vid && d == 0.0 })

    val before = VamanaIndex.selfSearchPersisted(spark, dir, numQueries = 8, k = 5)
      .collect().map(_.toString).toSeq
    val src2 = MemoryStream[(Long, Array[Float])]
    val q2 = StreamingAnalytics.vamanaIngestLoop(
      src2.toDF().toDF("vec_id", "embedding"), dir)
    try {
      src2.addData(arrivals.take(50).toSeq) // replays as batchId 0
      q2.processAllAvailable()
    } finally q2.stop()
    val after = VamanaIndex.selfSearchPersisted(spark, dir, numQueries = 8, k = 5)
      .collect().map(_.toString).toSeq
    assert(after == before, "replayed batch must not mutate the graphs")
  }

  test("dedupIngestLoop: cross-batch and in-batch dups drop; replay never double-appends") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("dedupingest").toString
    val src = MemoryStream[(Long, String)]
    val q = StreamingAnalytics.dedupIngestLoop(
      src.toDF().toDF("doc_id", "text"), dir)
    try {
      // batch 0: doc 2 duplicates doc 1 in-batch
      src.addData((1L, "alpha"), (2L, "alpha"), (3L, "beta"))
      q.processAllAvailable()
      // batch 1: doc 4 duplicates the already-seen "beta"; doc 5 is new
      src.addData((4L, "beta"), (5L, "gamma"))
      q.processAllAvailable()
    } finally q.stop()
    val docs = spark.read.parquet(s"$dir/batches/*/docs")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(docs == Seq(1L, 3L, 5L), s"got $docs")
    assert(spark.read.parquet(s"$dir/batches/*/seen").count() == 3)

    // replay batch 0 on a fresh stream: the marker makes it a no-op
    val src2 = MemoryStream[(Long, String)]
    val q2 = StreamingAnalytics.dedupIngestLoop(
      src2.toDF().toDF("doc_id", "text"), dir)
    try {
      src2.addData((1L, "alpha"), (2L, "alpha"), (3L, "beta"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(s"$dir/batches/*/docs").count() == 3,
      "replayed batch must not re-append")
    // atomicity surface: every committed batch dir holds BOTH tables
    // plus the _commit marker written strictly last
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.globStatus(new org.apache.hadoop.fs.Path(s"$dir/batches/*")).foreach { st =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "docs")))
      assert(fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "seen")))
      assert(fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_commit")))
    }

    // crash-mid-copy recovery (the object-store rename failure mode):
    // strip batch 1 down to a markerless partial dir — the replay must
    // DELETE it and redo the batch, not trust the partial contents
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/batches/1/_commit"), false)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/batches/1/seen"), true)
    val src3 = MemoryStream[(Long, String)]
    val q3 = StreamingAnalytics.dedupIngestLoop(
      src3.toDF().toDF("doc_id", "text"), dir)
    try {
      src3.addData((1L, "alpha"), (2L, "alpha"), (3L, "beta")) // batch 0: marker no-op
      q3.processAllAvailable()
      src3.addData((4L, "beta"), (5L, "gamma")) // batch 1: redo the partial
      q3.processAllAvailable()
    } finally q3.stop()
    val redone = spark.read.parquet(s"$dir/batches/*/docs")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(redone == Seq(1L, 3L, 5L), s"partial batch must be redone once: $redone")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/batches/1/_commit")))
  }

  test("sketchIngestLoop: streamed registers equal the batch sketch; replay leaves them unchanged") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sketchingest").toString
    val src = MemoryStream[Long]
    val q = StreamingAnalytics.sketchIngestLoop(src.toDF().toDF("k"), "k", dir, m = 64)
    try {
      src.addData(1L to 500L: _*)
      q.processAllAvailable()
      src.addData(300L to 800L: _*)
      q.processAllAvailable()
    } finally q.stop()
    def regMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val streamed = regMap(StreamingAnalytics.sketchRegisters(spark, dir))
    val batch = regMap(graft.operators.Sketches.hllRegisters(
      (1L to 800L).toDF("k"), "k", 64))
    assert(streamed == batch,
      "merged per-batch registers must equal the one-shot sketch over all keys")
    // replay batch 0 on a fresh stream: marker (and max-merge idempotence) => no change
    val src2 = MemoryStream[Long]
    val q2 = StreamingAnalytics.sketchIngestLoop(src2.toDF().toDF("k"), "k", dir, m = 64)
    try {
      src2.addData(1L to 500L: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(regMap(StreamingAnalytics.sketchRegisters(spark, dir)) == batch)
    // ADVICE r7: snapshots are versioned behind the pointer — a crash
    // mid-publish can never destroy the accumulated registers, because
    // the previous version is a different directory. Simulate the crash:
    // an unpointed partial v_99 must be invisible to readers.
    val regDir = s"$dir/registers"
    val before = graft.sources.IndexVersions.latest(spark, regDir).get
    val partial = new java.io.File(s"$regDir/v_99")
    assert(partial.mkdirs())
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$regDir/v_99/part-garbage"),
      Array[Byte](1, 2, 3))
    assert(graft.sources.IndexVersions.latest(spark, regDir).contains(before),
      "an unpointed partial snapshot must not be served")
    assert(regMap(StreamingAnalytics.sketchRegisters(spark, dir)) == batch)
  }
}
