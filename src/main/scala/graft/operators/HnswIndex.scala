package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HNSW-family ANN — per-partition navigable-small-world graphs
  * (SURVEY §2.3 J4; reference `IndexHNSWFlat(d, M=32)`, efConstruction=64,
  * efSearch=64 — vector_search_cluster.py:1043-1045, :551-552).
  *
  * A greedy graph walk is inherently sequential, so there is no faithful
  * whole-cluster dataflow form (SURVEY §7.4); but the REFERENCE never
  * builds one either — it builds an independent HNSW per shard and merges
  * shard-local top-k on the coordinator. That architecture maps exactly:
  * one local graph per Spark partition built and walked inside
  * `mapPartitions` (the sanctioned escape hatch for per-partition
  * imperative logic), then the standard distributed top-k merge (A1).
  * Partitions build independently — at 100 TB this scales out linearly
  * like the reference's shard builders, and graph size per partition is
  * bounded by `maxPartitionBytes`.
  *
  * The graph is single-layer NSW (no hierarchy): with per-partition node
  * counts bounded by partition sizing, the log-factor the hierarchy buys
  * is marginal; determinism (fixed insertion order, id tie-breaks) is
  * kept instead for reproducible tests.
  */
object HnswIndex {

  /** Graph/search parameters — defaults mirror the reference's. */
  case class Params(m: Int = 32, efConstruction: Int = 64, efSearch: Int = 64)

  /** One partition's graph: ids, vectors, adjacency. */
  private final class LocalGraph(params: Params) {
    val ids = mutable.ArrayBuffer.empty[Long]
    val vecs = mutable.ArrayBuffer.empty[Array[Float]]
    val adj = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[Int]]

    private def dist(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1 }
      s
    }

    /** Beam search from node 0: best `ef` nodes by distance to `q`,
      * deterministic (ties by node index). */
    def beamSearch(q: Array[Float], ef: Int): Seq[(Double, Int)] = {
      if (ids.isEmpty) return Nil
      val visited = mutable.BitSet(0)
      implicit val ord: Ordering[(Double, Int)] = Ordering.Tuple2
      val candidates = mutable.PriorityQueue((-dist(q, vecs(0)), 0)) // max-heap on negated = min-heap
      val result = mutable.PriorityQueue((dist(q, vecs(0)), 0)) // max-heap: worst on top
      while (candidates.nonEmpty) {
        val (negD, node) = candidates.dequeue()
        val d = -negD
        if (result.size >= ef && d > result.head._1) {
          candidates.clear() // all remaining are farther — greedy stop
        } else {
          adj(node).foreach { nb =>
            if (!visited.contains(nb)) {
              visited += nb
              val nd = dist(q, vecs(nb))
              if (result.size < ef || nd < result.head._1) {
                candidates.enqueue((-nd, nb))
                result.enqueue((nd, nb))
                if (result.size > ef) result.dequeue()
              }
            }
          }
        }
      }
      result.toSeq.sortBy(t => (t._1, ids(t._2)))
    }

    /** Insert with NSW construction: connect to the m nearest of the
      * already-inserted nodes (found by beam search), bidirectionally,
      * pruning neighbor lists back to m by distance. */
    def insert(id: Long, vec: Array[Float]): Unit = {
      val idx = ids.length
      ids += id
      vecs += vec
      adj += mutable.ArrayBuffer.empty[Int]
      if (idx == 0) return
      val nearest = beamSearch(vec, params.efConstruction).take(params.m)
      nearest.foreach { case (_, nb) =>
        adj(idx) += nb
        adj(nb) += idx
        if (adj(nb).length > params.m) {
          // keep the m closest neighbors (ties by id — deterministic)
          val pruned = adj(nb)
            .map(x => ((dist(vecs(nb), vecs(x)), ids(x)), x))
            .sortBy(_._1).take(params.m).map(_._2)
          adj(nb).clear()
          adj(nb) ++= pruned
        }
      }
    }
  }

  /** Distributed HNSW self-search: per-partition graphs over the hashed
    * vector table, each walked for every (broadcast) query, local top-k
    * merged globally (A1). Output matches the other k-NN operators:
    * (query_id, rank, vec_id, dist) ordered. */
  def selfSearch(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int,
      numPartitions: Int = 0,
      params: Params = Params()): DataFrame = {
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
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .repartition(parts, col("vec_id"))
      .mapPartitions { rows =>
        val graph = new LocalGraph(p)
        // deterministic build order within the partition
        rows.toSeq.sortBy(_._1).foreach { case (id, v) => graph.insert(id, v) }
        bcQueries.value.iterator.flatMap { case (qid, qv) =>
          graph.beamSearch(qv, p.efSearch)
            .filter { case (_, node) => graph.ids(node) != qid }
            .take(k)
            .map { case (d, node) => (qid, graph.ids(node), d) }
        }
      }
      .toDF("query_id", "vec_id", "dist")

    val w = Window.partitionBy(col("query_id")).orderBy(col("dist"), col("vec_id"))
    partials
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"), round(col("dist"), 4).as("dist"))
      .orderBy(col("query_id"), col("rank"))
  }
}
