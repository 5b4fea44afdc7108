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
    // dupMultiplicity = Some(1.0) PINS the caller beam for the fixed /
    // selectivity-only measurements (None now defaults the k·m floor
    // from the index meta — the r13 planner wiring tested below)
    val vFixed = recall(VamanaIndex.selfSearchFilteredPersisted(
      spark, vamanaDir, allowed, numQueries = 8, k = 10, searchBeam = beam,
      dupMultiplicity = Some(1.0)))
    val vAuto = recall(VamanaIndex.selfSearchFilteredPersisted(
      spark, vamanaDir, allowed, numQueries = 8, k = 10, searchBeam = beam,
      selectivity = Some(sel), dupMultiplicity = Some(1.0)))
    val hFixed = recall(HnswIndex.selfSearchFilteredPersisted(
      spark, hnswDir, allowed, numQueries = 8, k = 10, efFiltered = beam,
      dupMultiplicity = Some(1.0)))
    val hAuto = recall(HnswIndex.selfSearchFilteredPersisted(
      spark, hnswDir, allowed, numQueries = 8, k = 10, efFiltered = beam,
      selectivity = Some(sel), dupMultiplicity = Some(1.0)))
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

    // and the build-time estimate must recover the fixture's true
    // multiplicity (jitter splits a single full-width SimHash — the
    // banded+CC estimator exists exactly so this assert holds)
    val storedV = VamanaIndex.readDupMultiplicity(spark, vamanaDir)
    val storedH = HnswIndex.readDupMultiplicity(spark, hnswDir)
    info(f"stored dup_multiplicity: vamana=${storedV.getOrElse(-1.0)}%.2f hnsw=${storedH.getOrElse(-1.0)}%.2f (fixture m=$mult)")
    assert(storedV.isDefined && storedH.isDefined,
      "writeIndex must persist the build-time multiplicity estimate")
    assert(storedV.exists(m => m >= mult * 0.25 && m <= mult * 2.0),
      s"stored multiplicity ${storedV.get} should track the fixture's m=$mult " +
        "(jitter splits under-estimate; direct collisions never exceed 2m)")
  }

  test("incremental adds refresh the stored multiplicity: a replicated batch restores planner-alone filtered recall") {
    // r13 verdict item 3: the build-time dup_multiplicity described the
    // corpus at write time; a FreshDiskANN-style deployment that streams
    // in a heavily-duplicated batch must not silently under-floor its
    // filtered beams. Build on the UNIQUE corpus (m̂ ≈ 1), addToIndex a
    // 64-way-replicated batch (growth ≫ the 1.1 refresh threshold), and
    // the planner-alone serve (dupMultiplicity = None) must bridge the
    // new clouds where the stale floor could not.
    val mult = 64
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_filtrec_add_vamana"
    VamanaIndex.writeIndex(emb, dir, numPartitions = 1)
    val before = VamanaIndex.readDupMultiplicity(spark, dir).get
    assert(before < 4.0, s"unique corpus should estimate near 1 (got $before)")
    // the added batch: 63 jittered replicas of base rows 0..59 — base
    // row 0 (replica 0) is already in the index, so after the add the
    // low query ids sit inside 64-way clouds
    val added = emb.where($"vec_id" < 60)
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect().toSeq.flatMap {
        case (id, v, l) =>
          (1 until mult).map { r =>
            val rr = new scala.util.Random(42000L + id * 1000 + r)
            (id + r * 10000000L,
              v.map(x => x + (rr.nextFloat() - 0.5f) * 0.1f), l)
          }
      }.toDF("vec_id", "embedding", "label")
    VamanaIndex.addToIndex(added.select($"vec_id", $"embedding"), dir)
    val after = VamanaIndex.readDupMultiplicity(spark, dir).get
    info(f"stored dup_multiplicity before=$before%.2f after=$after%.2f (batch m=$mult)")
    assert(after >= 4 * before && after >= 8.0,
      s"addToIndex did not refresh the stale estimate ($before -> $after)")
    // planner-alone recall on the now-duplicated corpus: the exact
    // baseline runs over everything the index holds (base ∪ added)
    val full = emb.select($"vec_id", $"embedding", $"label").unionByName(added)
    val pred = $"label" < 4
    val exact = KnnSearch.topK(
        full.where($"vec_id" < 8).select($"vec_id".as("query_id"), $"embedding".as("qvec")),
        full.where(pred).select($"vec_id", $"embedding".as("vec")),
        k = 10, excludeSelf = true)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val allowed = full.where(pred).select($"vec_id")
    val planner = recallOf(VamanaIndex.selfSearchFilteredPersisted(
      spark, dir, allowed, numQueries = 8, k = 10, searchBeam = 4), exact)
    val pinned = recallOf(VamanaIndex.selfSearchFilteredPersisted(
      spark, dir, allowed, numQueries = 8, k = 10, searchBeam = 4,
      dupMultiplicity = Some(1.0)), exact)
    info(f"planner-alone=$planner%.3f pinned-beam=$pinned%.3f")
    assert(planner >= 0.9, s"planner-alone recall after the add: $planner")
    assert(planner >= pinned,
      "the refreshed floor must never score below the pinned beam")
    assert(pinned <= 0.95,
      s"fixture no longer truncates at the pinned beam ($pinned) — not distinguishing")
  }

  test("the PLANNER ALONE (no manual m) recovers >= 0.9 where selectivity-only scaling truncates") {
    // r12 verdict item 1 — the k·m floor with NO manual knob: the
    // build-time multiplicity estimate rides in the index meta and
    // defaults the floor when the caller passes None. The distinguishing
    // geometry needs clouds LARGER than the selectivity-scaled beam: at
    // a permissive predicate (≈ 40-50 % of clouds allowed, whole clouds
    // share a label) the sel rule gives beam ≈ 12/0.5 = 24, but a query
    // whose own 64-way cloud is DISALLOWED must bridge past ~64 near
    // ties to reach its first allowed neighbor — the r12 ladder's
    // absolute-beam regime. The meta floor k·m̂ ≈ 640 bridges it.
    val mult = 64
    val base = emb.where($"vec_id" < 125)
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect().toSeq
    val repl = base.flatMap { case (id, v, l) =>
      (0 until mult).map { r =>
        val rr = new scala.util.Random(42000L + id * 1000 + r)
        val vv = if (r == 0) v
                 else v.map(x => x + (rr.nextFloat() - 0.5f) * 0.1f)
        (id + r * 10000000L, vv, l)
      }
    }.toDF("vec_id", "embedding", "label").cache()
    val hnswDir = s"${System.getProperty("java.io.tmpdir")}/graft_filtrec_meta_hnsw"
    val vamanaDir = s"${System.getProperty("java.io.tmpdir")}/graft_filtrec_meta_vamana"
    HnswIndex.writeIndex(repl, hnswDir, numPartitions = 1)
    VamanaIndex.writeIndex(repl, vamanaDir, numPartitions = 1)
    val storedV = VamanaIndex.readDupMultiplicity(spark, vamanaDir)
    info(f"stored dup_multiplicity=${storedV.getOrElse(-1.0)}%.2f (fixture m=$mult)")
    assert(storedV.exists(m => m >= mult * 0.25 && m <= mult * 2.0),
      s"stored multiplicity ${storedV} should track the fixture's m=$mult")
    val pred = $"label" < 4
    val sel = FilteredSearchPlanner.selectivityOf(repl, pred)
    assert(sel > 0.3 && sel < 0.7, s"fixture selectivity drifted: $sel")
    val exact = KnnSearch.topK(
        repl.where($"vec_id" < 8).select($"vec_id".as("query_id"), $"embedding".as("qvec")),
        repl.where(pred).select($"vec_id", $"embedding".as("vec")),
        k = 10, excludeSelf = true)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: DataFrame): Double = {
      val got = df.select($"query_id", $"vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got intersect exact).size.toDouble / exact.size
    }
    val allowed = repl.where(pred).select($"vec_id")
    // beam 4 → selectivity-scaled ≈ 4/0.4 = 10 ≪ the 64-way cloud a
    // disallowed-label query must bridge; the meta floor k·m̂ ≈ 250+
    // bridges it (HNSW's walk floors its ef at k+1 ≈ 11 → sel-scaled
    // ≈ 27, which this small single shard does not always starve — the
    // truncation disjunction below holds through the Vamana side)
    val beam = 4
    val vSelOnly = recall(VamanaIndex.selfSearchFilteredPersisted(
      spark, vamanaDir, allowed, numQueries = 8, k = 10, searchBeam = beam,
      selectivity = Some(sel), dupMultiplicity = Some(1.0)))
    val vPlanner = recall(VamanaIndex.selfSearchFilteredPersisted(
      spark, vamanaDir, allowed, numQueries = 8, k = 10, searchBeam = beam,
      selectivity = Some(sel))) // m defaults from the index meta
    val hSelOnly = recall(HnswIndex.selfSearchFilteredPersisted(
      spark, hnswDir, allowed, numQueries = 8, k = 10, efFiltered = beam,
      selectivity = Some(sel), dupMultiplicity = Some(1.0)))
    val hPlanner = recall(HnswIndex.selfSearchFilteredPersisted(
      spark, hnswDir, allowed, numQueries = 8, k = 10, efFiltered = beam,
      selectivity = Some(sel)))
    info(f"sel=$sel%.3f vamana selOnly=$vSelOnly%.3f planner=$vPlanner%.3f; hnsw selOnly=$hSelOnly%.3f planner=$hPlanner%.3f")
    assert(vPlanner >= 0.9, s"vamana planner-alone recall (meta k·m floor): $vPlanner")
    assert(hPlanner >= 0.9, s"hnsw planner-alone recall (meta k·m floor): $hPlanner")
    assert(vPlanner >= vSelOnly && hPlanner >= hSelOnly,
      "the meta floor must never score below selectivity-only scaling")
    // a single small shard only mildly starves the sel-scaled walk (its
    // termination rule keeps exploring while fewer than k allowed nodes
    // are in hand) — the crisp ~0.79 selectivity-only regime lives at
    // the 100× fixture scale, measured by graft.FilteredBeamScale's
    // meta-floor mode (SCALE.md round 13); here gate that the planner
    // strictly improves on a measurably truncating sel-only walk
    assert(vSelOnly <= 0.95 || hSelOnly <= 0.95,
      s"fixture no longer truncates under selectivity-only scaling " +
        s"(vamana=$vSelOnly hnsw=$hSelOnly) — the planner-alone case is not distinguishing")
    assert(vPlanner > vSelOnly || hPlanner > hSelOnly,
      "the meta floor should strictly improve at least one family on this fixture")
  }
}
