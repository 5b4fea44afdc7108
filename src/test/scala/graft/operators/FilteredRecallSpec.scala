package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Production-beam FILTERED graph-search recall gate — the number
  * q_filtered_recall reports per round (there the sf0.01 shards are
  * small enough that ef = 64 saturates; here a SINGLE 500-node shard
  * makes ef = 64 a genuine beam ≪ n, so the gate actually exercises
  * the truncated filtered walk on both persisted families at both
  * selectivities). The reference serves this mode as IDSelector over a
  * loaded index (vector_search_cluster.py:548-552).
  */
class FilteredRecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  private def exactFiltered(pred: org.apache.spark.sql.Column): Set[(Long, Long)] =
    KnnSearch.topK(
        emb.where($"vec_id" < 8).select($"vec_id".as("query_id"), $"embedding".as("qvec")),
        emb.where(pred).select($"vec_id", $"embedding".as("vec")),
        k = 10, excludeSelf = true)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recallOf(run: DataFrame, exact: Set[(Long, Long)]): Double = {
    val got = run.select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (got intersect exact).size.toDouble / exact.size
  }

  test("filtered recall@10 >= 0.8 at ef=64 << n on both persisted families, both selectivities") {
    val hnswDir = s"${System.getProperty("java.io.tmpdir")}/graft_filtrec_hnsw"
    val vamanaDir = s"${System.getProperty("java.io.tmpdir")}/graft_filtrec_vamana"
    // ONE partition: the whole 500-row corpus is a single graph, so the
    // ef = 64 walk visits <= ~13% of nodes — a real truncated beam
    HnswIndex.writeIndex(emb, hnswDir, numPartitions = 1)
    VamanaIndex.writeIndex(emb, vamanaDir, numPartitions = 1)
    Seq(("half", $"label" < 4), ("tenth", $"label" === 0)).foreach {
      case (sel, pred) =>
        val exact = exactFiltered(pred)
        val allowed = emb.where(pred).select($"vec_id")
        val h = recallOf(HnswIndex.selfSearchFilteredPersisted(
          spark, hnswDir, allowed, numQueries = 8, k = 10, efFiltered = 64), exact)
        val v = recallOf(VamanaIndex.selfSearchFilteredPersisted(
          spark, vamanaDir, allowed, numQueries = 8, k = 10, searchBeam = 64), exact)
        info(f"sel=$sel hnsw=$h%.3f vamana=$v%.3f")
        assert(h >= 0.8, s"hnsw filtered recall at ef=64, sel=$sel: $h")
        assert(v >= 0.8, s"vamana filtered recall at L=64, sel=$sel: $v")
    }
  }
}
