package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{HnswIndex, IvfIndex, IvfPqIndex, KnnSearch, OpqIndex, PqIndex, VamanaIndex}

/** Thin unified API over the index families (SURVEY §7.1) — the Spark
  * counterpart of the reference's `create-index --type flat|ivf|ivfpq|hnsw`
  * CLI (vector_search_cluster.py:977-1068) and `distributed_search`
  * (:186-250): pick an index spec, run the same self-search contract.
  *
  * Defaults mirror the reference's parameters where they exist: IVF
  * nprobe = max(1, nlist/8) (:548-549), PQ m = d/4 with 8-bit codes
  * scaled down to test dimensions, HNSW M=32/ef=64 (:1044-1045, :551-552).
  */
object VectorIndex {

  sealed trait IndexSpec
  /** Exact brute force (`IndexFlatL2`). */
  case object Flat extends IndexSpec
  /** Inverted file with `nlist` k-means lists, probing `nprobe`. */
  final case class Ivf(nlist: Int, nprobe: Int, trained: Boolean = true) extends IndexSpec
  /** Flat product quantization with ADC (+ optional exact re-rank). */
  final case class Pq(m: Int, subDim: Int, ksub: Int, rerank: Int = 0) extends IndexSpec
  /** Combined IVF + residual PQ (`IndexIVFPQ`). */
  final case class IvfPq(nlist: Int, nprobe: Int, m: Int, subDim: Int, ksub: Int,
      trained: Boolean = false) extends IndexSpec
  /** Per-partition navigable-small-world graphs. */
  final case class Hnsw(m: Int = 32, efConstruction: Int = 64, efSearch: Int = 64) extends IndexSpec
  /** Per-shard Vamana/DiskANN graphs (R = degree, L = beam, α = prune slack). */
  final case class Vamana(r: Int = 32, l: Int = 64, alpha: Double = 1.2,
      numPartitions: Int = 0) extends IndexSpec
  /** Learned-rotation PQ (`OPQMatrix` + PQ). */
  final case class Opq(m: Int, subDim: Int, ksub: Int, iters: Int = 6) extends IndexSpec
  /** Learned rotation fronting residual IVFPQ (`OPQ → IVFPQ`, the FAISS
    * IndexPreTransform recipe). */
  final case class OpqIvfPq(nlist: Int, nprobe: Int, m: Int, subDim: Int, ksub: Int,
      iters: Int = 6) extends IndexSpec
  /** IVF with HNSW coarse quantizer (`IVF*_HNSW*`). */
  final case class IvfHnsw(nlist: Int, nprobe: Int,
      graph: Hnsw = Hnsw()) extends IndexSpec

  /** Self-search contract shared by every index family: the first
    * `numQueries` vectors of `embeddings(vec_id, embedding)` query the
    * full table; returns (query_id, rank, vec_id, dist) ordered. */
  def selfSearch(
      embeddings: DataFrame,
      numQueries: Int,
      k: Int,
      spec: IndexSpec): DataFrame = spec match {
    case Flat =>
      KnnSearch.selfTopK(embeddings, numQueries, k)
    case Ivf(nlist, nprobe, trained) =>
      if (trained) IvfIndex.selfSearchTrained(embeddings, numQueries, nlist, nprobe, k)
      else IvfIndex.selfSearchSeeded(embeddings, numQueries, nlist, nprobe, k)
    case Pq(m, subDim, ksub, rerank) =>
      if (rerank > 0)
        PqIndex.selfSearchReranked(embeddings, numQueries, m, subDim, ksub, k, rerank)
      else PqIndex.selfSearchTrained(embeddings, numQueries, m, subDim, ksub, k)
    case IvfPq(nlist, nprobe, m, subDim, ksub, trained) =>
      if (trained)
        IvfPqIndex.selfSearchTrained(embeddings, numQueries, nlist, nprobe, m, subDim, ksub, k)
      else
        IvfPqIndex.selfSearchSeeded(embeddings, numQueries, nlist, nprobe, m, subDim, ksub, k)
    case Hnsw(m, efC, efS) =>
      HnswIndex.selfSearch(embeddings, numQueries, k,
        params = HnswIndex.Params(m, efC, efS))
    case Vamana(r, l, alpha, parts) =>
      VamanaIndex.selfSearch(embeddings, numQueries, k, parts,
        params = VamanaIndex.Params(r, l, alpha))
    case Opq(m, subDim, ksub, iters) =>
      OpqIndex.selfSearchTrained(embeddings, numQueries, m, subDim, ksub, k, iters)
    case OpqIvfPq(nlist, nprobe, m, subDim, ksub, iters) =>
      OpqIndex.selfSearchOpqIvfPq(embeddings, numQueries, nlist, nprobe,
        m, subDim, ksub, k, iters)
    case IvfHnsw(nlist, nprobe, g) =>
      import org.apache.spark.sql.functions.col
      val cents = IvfIndex.seedCentroids(embeddings, nlist)
      val q = embeddings.where(col("vec_id") < numQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      HnswIndex.searchIvfHnsw(q, cents, IvfIndex.assign(embeddings, cents),
          nprobe, k, excludeSelf = true,
          params = HnswIndex.Params(g.m, g.efConstruction, g.efSearch))
        .select(col("query_id"), col("rank"), col("vec_id"),
          org.apache.spark.sql.functions.round(col("dist"), 4).as("dist"))
        .orderBy(col("query_id"), col("rank"))
  }
}
