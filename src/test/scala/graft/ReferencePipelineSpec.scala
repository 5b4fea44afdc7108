package graft

import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.{NpyReader, NpyWriter}

/** The reference's full offline→online lifecycle, end to end, on ONE
  * corpus (vector_search_cluster.py:1071-1242 builder, :523-563 load,
  * :641-668 serve): `.npy` vector files in → shard assignment + shards
  * metadata → build and PERSIST every index family the reference builds
  * (FLAT / IVF / IVFPQ / HNSW, :1020-1045, :1051-1054) → reload each
  * from disk → answer the same query batch from all four. The per-family
  * paths are each oracle-/spec-verified elsewhere; this spec proves the
  * composition a reference user actually runs — their whole workflow,
  * one library. */
class ReferencePipelineSpec extends SparkSpec {
  import spark.implicits._

  test("npy → shard → build+persist all four families → load → serve one query batch") {
    val emb0 = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val work = java.nio.file.Files.createTempDirectory("refpipe").toString
    val n = emb0.count()

    // 1. the reference's input format: .npy shard files (V:977-1018)
    NpyWriter.write(emb0.select($"vec_id", $"embedding"), s"$work/npy", parts = 4)
    val corpus = NpyReader.read(spark, s"$work/npy").cache()
    assert(corpus.count() == n)

    // 2. shard assignment + shards_metadata (V:1001-1015, V:1056-1066)
    val sharded = Sharding.evenSplitScalable(corpus, 4, "vec_id")
    val meta = Sharding.shardMetadata(sharded, "mixed", 64).collect()
    assert(meta.length == 4 && meta.map(_.getAs[Long]("num_vectors")).sum == n)

    // 3. build + persist every family the reference's builder emits
    corpus.write.mode("overwrite").parquet(s"$work/flat") // IndexFlatL2 stores raw vectors
    val cents = IvfIndex.seedCentroids(corpus, 16)
    IvfIndex.writeIndex(IvfIndex.assign(corpus, cents), cents, s"$work/ivf")
    val (pqCents, cb, codes) =
      IvfPqIndex.buildSeeded(corpus, nlist = 8, m = 8, subDim = 8, ksub = 16)
    IvfPqIndex.writeIndex(codes, s"$work/ivfpq")
    HnswIndex.writeIndex(corpus, s"$work/hnsw", numPartitions = 4)
    // plus the engine's second graph family (beyond the reference's four)
    VamanaIndex.writeIndex(corpus, s"$work/vamana", numPartitions = 4)

    // 4. reload each index from disk and serve ONE query batch on all four
    val q = corpus.where($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    def idSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    val flat = KnnSearch.topK(q,
      spark.read.parquet(s"$work/flat").select($"vec_id", $"embedding".as("vec")), k = 5)
    val (ivfCents, assignments) = IvfIndex.loadIndex(spark, s"$work/ivf")
    val ivfFull = IvfIndex.searchPruned(q, ivfCents, assignments, nprobe = 16, k = 5)
    val ivfpq = IvfPqIndex.searchPruned(q, pqCents, cb,
      spark.read.parquet(s"$work/ivfpq"), nprobe = 2, m = 8, subDim = 8, k = 5)
    val hnsw = HnswIndex.searchPersisted(q, s"$work/hnsw", k = 5)
    val vamana = VamanaIndex.searchPersisted(q, s"$work/vamana", k = 5)

    // every family answers the full batch with k rows per query
    Seq("flat" -> flat, "ivf" -> ivfFull, "ivfpq" -> ivfpq, "hnsw" -> hnsw,
      "vamana" -> vamana)
      .foreach { case (name, df) =>
        val counts = df.groupBy($"query_id").count().collect()
        assert(counts.length == 4 && counts.forall(_.getLong(1) == 5), name)
      }
    // IVF at nprobe = nlist scans everything ⇒ identical neighbor set to FLAT
    assert(idSet(ivfFull) == idSet(flat))
    // graph search over corpus-vector queries finds the query itself first
    Seq(hnsw, vamana).foreach(g => assert(g.where($"rank" === 1).collect()
      .forall(r => r.getAs[Long]("vec_id") == r.getAs[Long]("query_id")
        && r.getAs[Double]("dist") == 0.0)))
  }
}
