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

  test("auto beam (L ≈ ef/selectivity) recovers ≥ 0.9 where the fixed production beam truncates") {
    // uniform small corpora do NOT truncate (the scarce-allowed result
    // heap keeps the walk exploring — measured: 500 and 20k uniform rows
    // score 1.000 at beam 12); what starves the filtered walk is the
    // scale fixtures' replica MICRO-CLUSTER geometry (each point becomes
    // a ±0.05 cloud — gen_scale_fixture.py), where the beam fills with
    // one cloud's disallowed members. Reproduce that geometry small:
    // 16 seeded replicas of the 500-row corpus = 8k rows, one shard.
    val mult = 16
    val repl = emb.select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect().toSeq.flatMap {
        case (id, v, l) =>
          (0 until mult).map { r =>
            val rr = new scala.util.Random(42000L + id * 1000 + r)
            val vv = if (r == 0) v
                     else v.map(x => x + (rr.nextFloat() - 0.5f) * 0.1f)
            (id + r * 10000000L, vv, l)
          }
      }.toDF("vec_id", "embedding", "label").cache()
    val hnswDir = s"${System.getProperty("java.io.tmpdir")}/graft_filtrec_auto_hnsw"
    val vamanaDir = s"${System.getProperty("java.io.tmpdir")}/graft_filtrec_auto_vamana"
    HnswIndex.writeIndex(repl, hnswDir, numPartitions = 1)
    VamanaIndex.writeIndex(repl, vamanaDir, numPartitions = 1)
    val pred = $"label" === 0
    val exact = KnnSearch.topK(
        repl.where($"vec_id" < 8).select($"vec_id".as("query_id"), $"embedding".as("qvec")),
        repl.where(pred).select($"vec_id", $"embedding".as("vec")),
        k = 10, excludeSelf = true)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val allowed = repl.where(pred).select($"vec_id")
    val sel = FilteredSearchPlanner.selectivityOf(repl, pred)
    assert(sel > 0.05 && sel < 0.2, s"fixture selectivity drifted: $sel")
    def recall(df: DataFrame): Double = {
      val got = df.select($"query_id", $"vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got intersect exact).size.toDouble / exact.size
    }
    val beam = 12
    val vFixed = recall(VamanaIndex.selfSearchFilteredPersisted(
      spark, vamanaDir, allowed, numQueries = 8, k = 10, searchBeam = beam))
    val vAuto = recall(VamanaIndex.selfSearchFilteredPersisted(
      spark, vamanaDir, allowed, numQueries = 8, k = 10, searchBeam = beam,
      selectivity = Some(sel)))
    val hFixed = recall(HnswIndex.selfSearchFilteredPersisted(
      spark, hnswDir, allowed, numQueries = 8, k = 10, efFiltered = beam))
    val hAuto = recall(HnswIndex.selfSearchFilteredPersisted(
      spark, hnswDir, allowed, numQueries = 8, k = 10, efFiltered = beam,
      selectivity = Some(sel)))
    // the second measured floor: k·m for an m-way near-dup corpus (the
    // 100× ladder shows recall tracks absolute beam when clouds share a
    // label — SCALE.md round 12); here m = 16 ⇒ beam ≥ 160
    val vAutoM = recall(VamanaIndex.selfSearchFilteredPersisted(
      spark, vamanaDir, allowed, numQueries = 8, k = 10, searchBeam = beam,
      selectivity = Some(sel), dupMultiplicity = Some(mult.toDouble)))
    info(f"sel=$sel%.3f vamana fixed=$vFixed%.3f auto=$vAuto%.3f autoM=$vAutoM%.3f; hnsw fixed=$hFixed%.3f auto=$hAuto%.3f")
    assert(vAuto >= 0.9, s"vamana auto-beam recall: $vAuto")
    assert(hAuto >= 0.9, s"hnsw auto-beam recall: $hAuto")
    assert(vAutoM >= vAuto, "the k·m floor must not score below selectivity-only scaling")
    assert(vAuto >= vFixed && hAuto >= hFixed,
      "auto beam must never score below the fixed beam it scales")
    assert(vFixed <= 0.95 || hFixed <= 0.95,
      s"fixture no longer truncates (vamana=$vFixed hnsw=$hFixed) — shrink the fixed beam")
  }
}
