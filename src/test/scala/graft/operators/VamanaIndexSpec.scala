package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VamanaIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  test("Vamana recall@10 >= 0.9 vs exact FLAT at paper-ish params") {
    val exact = KnnSearch.selfTopK(emb, numQueries = 8, k = 10)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = VamanaIndex.selfSearch(emb, numQueries = 8, k = 10, numPartitions = 4)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann intersect exact).size.toDouble / exact.size
    info(f"Vamana recall@10 = $recall%.3f")
    assert(recall >= 0.9)
  }

  test("sharded recall: bench-scale partition counts, gate >= 0.85 at 32 shards") {
    // same measurement HnswIndexSpec records — the sharded-graph recall
    // tradeoff curve SCALE.md cites, on the largest local table
    val big = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    val exact = KnnSearch.selfTopK(big, numQueries = 16, k = 10)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val measured = Seq(4, 16, 32).map { parts =>
      val ann = VamanaIndex.selfSearch(big, numQueries = 16, k = 10, numPartitions = parts)
        .select($"query_id", $"vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (ann intersect exact).size.toDouble / exact.size
      info(f"Vamana recall@10 at $parts%2d shards = $recall%.3f")
      parts -> recall
    }
    big.unpersist()
    assert(measured.toMap.apply(32) >= 0.85)
  }

  test("sharded recall under ADVERSARIAL params: non-degenerate curve, monotone in shards") {
    // At the fixture params (R=32, L=64) the beam dominates every shard
    // and the 4/16/32 curve is flat at 1.0 — which measures nothing. The
    // round-6 verdict asked for params small enough that recall < 1.0,
    // so the sharding effect is MEASURED: with a fixed starved beam
    // (R=4, L=k), smaller shards mean easier walks and an exact
    // cross-shard merge, so recall must RISE with shard count — that is
    // the tradeoff (recall recovers as shards shrink, paid as a
    // parts-times search fan-out).
    val big = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    val weak = VamanaIndex.Params(r = 4, l = 10, alpha = 1.2)
    val exact = KnnSearch.selfTopK(big, numQueries = 16, k = 10)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val curve = Seq(4, 16, 32).map { parts =>
      val ann = VamanaIndex.selfSearch(big, numQueries = 16, k = 10,
          numPartitions = parts, params = weak)
        .select($"query_id", $"vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (ann intersect exact).size.toDouble / exact.size
      info(f"adversarial Vamana recall@10 (R=4, L=10) at $parts%2d shards = $recall%.3f")
      recall
    }
    big.unpersist()
    assert(curve.head < 1.0,
      s"params must starve the beam at 4 shards or the curve is degenerate: $curve")
    assert(curve.last > curve.head,
      s"recall must recover as shards shrink the per-graph problem: $curve")
    assert(curve.sliding(2).forall { case Seq(a, b) => b >= a },
      s"curve must be monotone non-decreasing in shard count: $curve")
  }

  test("persisted index: reload searches row-identical to the fresh build") {
    val dir = java.nio.file.Files.createTempDirectory("vamana_idx").toString
    VamanaIndex.writeIndex(emb, dir, numPartitions = 4)
    val fresh = VamanaIndex.selfSearch(emb, numQueries = 8, k = 10, numPartitions = 4)
      .collect().map(_.toSeq).toSeq
    val reloaded = VamanaIndex.selfSearchPersisted(spark, dir, numQueries = 8, k = 10)
      .collect().map(_.toSeq).toSeq
    assert(reloaded == fresh)
  }

  test("external-query serving matches self-search when queries are corpus rows") {
    val dir = java.nio.file.Files.createTempDirectory("vamana_srv").toString
    VamanaIndex.writeIndex(emb, dir, numPartitions = 4)
    val q = emb.where($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val served = VamanaIndex.searchPersisted(q, dir, k = 1)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // no self-exclusion: a corpus row's nearest neighbor is itself
    assert(served.toSeq == (0L until 4L).map(i => (i, i)))
  }

  test("medoids: entry point minimizes distance-to-centroid within its shard") {
    // 4 = the q_vamana_medoids oracle's shard count; 7 = prime, uneven
    // shard sizes — re-anchors the medoid rule at the non-4 counts the
    // defaultParallelism-sharded walks (q_vamana_knn) actually use, so
    // the %4 DuckDB pin and the walk entry points can't silently diverge
    Seq(4, 7).foreach { parts =>
      val medoids = VamanaIndex.medoids(emb, numPartitions = parts)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(medoids.length == parts)
      val byShard = emb.select($"vec_id", $"embedding")
        .as[(Long, Array[Float])].collect()
        .groupBy { case (id, _) => id % parts }
      medoids.foreach { case (pid, medoidId, n) =>
        val pts = byShard(pid)
        assert(n == pts.length)
        val d = pts.head._2.length
        val mean = new Array[Double](d)
        pts.sortBy(_._1).foreach { case (_, v) =>
          var j = 0; while (j < d) { mean(j) += v(j); j += 1 }
        }
        (0 until d).foreach(j => mean(j) /= pts.length)
        def d2(v: Array[Float]): Double =
          v.zipWithIndex.map { case (x, j) => val dd = x - mean(j); dd * dd }.sum
        val brute = pts.map { case (id, v) => (d2(v), id) }.min._2
        assert(medoidId == brute, s"parts $parts shard $pid")
      }
    }
  }

  test("addToIndex: added vectors are searchable, degree bound holds, untouched shards' files never move") {
    val dir = java.nio.file.Files.createTempDirectory("vamana_add").toString
    val params = VamanaIndex.Params(r = 16, l = 32)
    // base = all but vec_id 96..99; the adds route to shards 0..3 — but
    // restrict adds to shard 0 (vec_id % 4 == 0) to leave shards 1-3 untouched
    val adds = emb.where($"vec_id" >= 96 && pmod($"vec_id", lit(4)) === 0)
    val base = emb.where($"vec_id" < 96 || pmod($"vec_id", lit(4)) =!= 0)
    VamanaIndex.writeIndex(base, dir, numPartitions = 4, params = params)
    val untouchedBefore = new java.io.File(s"$dir/nodes/part_id=1")
      .listFiles().map(f => (f.getName, f.lastModified)).toSet
    VamanaIndex.addToIndex(adds, dir)
    val untouchedAfter = new java.io.File(s"$dir/nodes/part_id=1")
      .listFiles().map(f => (f.getName, f.lastModified)).toSet
    assert(untouchedAfter == untouchedBefore, "shard 1 received no adds — its files must not rewrite")
    // every added vector finds itself at rank 1 through the serving path
    val q = adds.select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val served = VamanaIndex.searchPersisted(q, dir, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(served.nonEmpty && served.forall { case (qid, vid, d) => qid == vid && d == 0.0 })
    val maxDeg = spark.read.parquet(s"$dir/nodes")
      .select(max(size($"adj"))).head().getInt(0)
    assert(maxDeg <= params.r)
    // total node count = base + adds
    assert(spark.read.parquet(s"$dir/nodes").count() == emb.count())
  }

  test("filtered search: exact under a selective predicate at L >= n; never returns disallowed nodes") {
    import graft.operators.KnnSearch
    val exact = KnnSearch.topK(
        emb.where($"vec_id" < 8).select($"vec_id".as("query_id"), $"embedding".as("qvec")),
        emb.where($"label" < 2).select($"vec_id", $"embedding".as("vec")),
        k = 5, excludeSelf = true)
      .select($"query_id", $"rank", $"vec_id").collect().map(_.toSeq).toSeq
    val got = VamanaIndex.selfSearchFiltered(emb, $"label" < 2, numQueries = 8,
        k = 5, numPartitions = 4, params = VamanaIndex.Params(r = 16, l = 32),
        searchBeam = 128)
      .select($"query_id", $"rank", $"vec_id").collect().map(_.toSeq).toSeq
    assert(got == exact, "beam >= shard size must give the exact filtered top-k")
    // small beam: approximate, but the predicate is NEVER violated
    val allowed = emb.where($"label" < 2).select($"vec_id").as[Long].collect().toSet
    val approx = VamanaIndex.selfSearchFiltered(emb, $"label" < 2, numQueries = 8,
        k = 5, numPartitions = 4, params = VamanaIndex.Params(r = 8, l = 8),
        searchBeam = 8)
      .select($"vec_id").as[Long].collect()
    assert(approx.forall(allowed.contains), "filtered search must only emit allowed nodes")
  }

  test("selfSearchFilteredPersisted: served walk row-identical to the fresh filtered build; only allowed nodes") {
    // the q_vamana_filtered_knn serving shape (r9 verdict item 1): the
    // once-persisted α-pruned graphs answer the filtered walk — at
    // beam >= shard size both forms are the exact filtered top-k, so
    // the served read must be row-identical to the per-call build
    val dir = java.nio.file.Files.createTempDirectory("vamana_pfilt").toString
    val params = VamanaIndex.Params(r = 16, l = 32)
    VamanaIndex.writeIndex(emb, dir, numPartitions = 4, params = params)
    val allowedDf = emb.where($"label" < 2).select($"vec_id")
    val fresh = VamanaIndex.selfSearchFiltered(emb, $"label" < 2, numQueries = 8,
        k = 5, numPartitions = 4, params = params, searchBeam = 128)
      .collect().map(_.toString).toSeq
    val served = VamanaIndex.selfSearchFilteredPersisted(spark, dir, allowedDf,
        numQueries = 8, k = 5, searchBeam = 128)
      .collect().map(_.toString).toSeq
    assert(served == fresh)
    // production beam (L << n) trades recall but must never leak a
    // disallowed node through the cogrouped allow set
    val allowed = allowedDf.as[Long].collect().toSet
    val approx = VamanaIndex.selfSearchFilteredPersisted(spark, dir, allowedDf,
        numQueries = 8, k = 5, searchBeam = 8)
      .select($"vec_id").as[Long].collect()
    assert(approx.forall(allowed.contains))
  }

  test("patchReachability: a severed node regains medoid reachability; connected graphs untouched") {
    val pts = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1).take(32)
    val params = VamanaIndex.Params(r = 8, l = 16)
    val g = new VamanaIndex.LocalGraph(params)
    g.build(pts)
    // the build on real data comes out connected — the patch must be a no-op
    assert(g.patchReachability() == 0, "connected graph must gain no edges")
    // sever ALL in-edges of one non-medoid node (the failure mode the
    // ADVICE cited: backedge re-pruning dropping a node's last in-edge)
    val victim = (0 until pts.length).find(_ != g.medoid).get
    g.adj.foreach(nbrs => nbrs.filterInPlace(_ != victim))
    val added = g.patchReachability()
    assert(added >= 1, "severed node must be re-attached")
    assert(g.adj(g.medoid).contains(victim))
    // and a search with beam >= n now finds the victim's own vector
    val hits = g.search(pts(victim)._2, 1).map { case (_, node) => g.ids(node) }
    assert(hits == Seq(pts(victim)._1))
  }

  test("degree bound: every node's out-degree <= R after the build") {
    val dir = java.nio.file.Files.createTempDirectory("vamana_deg").toString
    val params = VamanaIndex.Params(r = 16, l = 32)
    VamanaIndex.writeIndex(emb, dir, numPartitions = 2, params = params)
    val maxDeg = spark.read.parquet(s"$dir/nodes")
      .select(size($"adj").as("deg")).agg(max($"deg")).head().getInt(0)
    assert(maxDeg <= params.r, s"max out-degree $maxDeg exceeds R=${params.r}")
  }

  test("exhaustive read beam equals brute-force FLAT at any shard count") {
    // the q_vamana_knn contract: build ends in patchReachability, so a
    // searchBeam >= shard size walk visits every node — exact top-k,
    // shard-count-invariant, equal to the FLAT oracle (build beam stays
    // the standard L; only the read side widens)
    val exact = KnnSearch.selfTopK(emb, numQueries = 8, k = 10)
      .collect().map(_.toString).toSeq
    Seq(3, 4).foreach { parts =>
      val walk = VamanaIndex.selfSearch(emb, numQueries = 8, k = 10,
          numPartitions = parts, searchBeam = Int.MaxValue)
        .collect().map(_.toString).toSeq
      assert(walk == exact, s"exhaustive beam at $parts shards must equal FLAT")
    }
  }
}
