package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Recall harness for the approximate paths (SURVEY §5.2): ANN results are
  * scored against our own DuckDB-verified FLAT output — recall@k =
  * |ANN ∩ exact| / |exact|, averaged over the query set. */
class IvfPqRecallSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()
  private lazy val exact = KnnSearch.selfTopK(emb, numQueries = 8, k = 10)
    .select($"query_id", $"vec_id").cache()

  private def recall(ann: DataFrame): Double = {
    val hits = ann.select($"query_id", $"vec_id").join(exact, Seq("query_id", "vec_id")).count()
    hits.toDouble / exact.count()
  }

  test("PQ4 packed search is bit-identical to unpacked PQ at ksub=16 (pack/unpack transparency)") {
    val unpacked = PqIndex.selfSearchSeeded(emb, numQueries = 8,
        m = 16, subDim = 4, ksub = 16, k = 10)
      .collect().map(_.toSeq).toSeq
    val packed = PqIndex.selfSearchSeeded4(emb, numQueries = 8,
        m = 16, subDim = 4, k = 10)
      .collect().map(_.toSeq).toSeq
    assert(packed == unpacked,
      "nibble packing must be representation-only — same ranks, same distances")
  }

  test("PQ4 packed bytes stay in [0, 255] with both nibbles in [0, 15]") {
    val cb = PqIndex.seedCodebooks(emb, m = 16, subDim = 4, ksub = 16)
    val rows = emb
      .withColumn("_c", PqIndex.encodeExpr($"embedding", cb, 16, 4))
      .select(PqIndex.packCodes4($"_c", 16).as("codes4"))
      .collect()
    rows.foreach { r =>
      val packed = r.getSeq[Long](0)
      assert(packed.length == 8)
      packed.foreach { b =>
        assert(b >= 0 && b <= 255)
        assert((b >> 4) <= 15 && (b & 15L) <= 15)
      }
    }
  }

  test("trained IVF recall@10 >= 0.85 at nprobe=nlist/4") {
    val r = recall(IvfIndex.selfSearchTrained(emb, numQueries = 8, nlist = 32, nprobe = 12, k = 10))
    info(f"IVF trained recall@10 = $r%.3f")
    assert(r >= 0.85)
  }

  test("seeded IVF recall@10 >= 0.8 at nprobe=4/16") {
    // The seeded path is fully deterministic (seed centroids + exact
    // argmin) — measured 0.900 on the current driver data; the 0.8 floor
    // (margin for driver data regeneration between rounds) trips any
    // probe-selection regression, which halves recall long before it
    // shaves 0.1.
    val r = recall(IvfIndex.selfSearchSeeded(emb, numQueries = 8, nlist = 16, nprobe = 4, k = 10))
    info(f"IVF seeded recall@10 = $r%.3f")
    assert(r >= 0.8)
  }

  // SMOKE check, not a quality gate: clusterless isotropic gaussians are
  // PQ's worst case (all neighbor distances concentrate), so the floor
  // only separates "pipeline runs and ranks better than chance" from
  // "broken encoder ≈ 0". Quality gates live on the clustered fixture.
  test("trained PQ raw-ADC smoke: recall@10 >= 0.35 on clusterless gaussians") {
    val r = recall(PqIndex.selfSearchTrained(emb, numQueries = 8, m = 8, subDim = 8, ksub = 64, k = 10))
    info(f"PQ trained recall@10 = $r%.3f")
    assert(r >= 0.35)
  }

  test("PQ with exact re-rank of ADC shortlist recall@10 >= 0.8") {
    val r = recall(PqIndex.selfSearchReranked(emb, numQueries = 8,
      m = 8, subDim = 8, ksub = 64, k = 10, shortlist = 50))
    info(f"PQ reranked recall@10 = $r%.3f")
    assert(r >= 0.8)
  }

  // SMOKE check, not a quality gate: seeded (untrained) centroids + 2/8
  // pruning on clusterless gaussian data bound recall hard; semantics are
  // oracle-verified (q_ivfpq_knn), quality gates are the clustered-fixture
  // trained specs below
  test("combined IVFPQ (residual encoding) smoke: recall@10 >= 0.2 at nprobe=2/8") {
    val r = recall(IvfPqIndex.selfSearchSeeded(emb, numQueries = 8,
      nlist = 8, nprobe = 2, m = 8, subDim = 8, ksub = 16, k = 10))
    info(f"IVFPQ residual recall@10 = $r%.3f")
    assert(r >= 0.2)
  }

  // ---- clustered fixture ------------------------------------------------
  // The gates above run on the driver's clusterless gaussians — the hardest
  // case for PQ (isotropic high-dim noise: all neighbor distances
  // concentrate, so ADC quantization error swamps the ranking signal) —
  // so their floors are necessarily lax (0.35 raw-ADC). A lax floor would
  // also pass a broken encoder, so the QUALITY gates live here, on data in
  // the regime the reference's 95.1% IVFPQ claim is measured in
  // (README.md:160): 16 well-separated cluster centers in [-8,8]^64, with
  // within-cluster offsets drawn from a shared rank-4 local subspace
  // (offset = B·z, z ∈ R⁴ gaussian) — the low-dimensional local structure
  // real embeddings have, where neighbor-distance gaps are large relative
  // to codebook quantization error. Residuals then live in one rank-4
  // subspace — the case residual encoding is DESIGNED for (coarse
  // centroid absorbs the cluster offset; PQ codes only the local
  // coordinates). A correct trained IVFPQ must reach ≥0.9 here and raw
  // trained ADC ≥0.6; a broken encoder/LUT/assign stays near 0.
  private lazy val clustered: DataFrame = {
    val rnd = new scala.util.Random(7)
    val dim = 64; val nClusters = 16; val perCluster = 125; val localRank = 4
    val centers = Array.fill(nClusters, dim)((rnd.nextDouble() * 16 - 8).toFloat)
    val basis = Array.fill(localRank, dim)(rnd.nextGaussian() / math.sqrt(dim))
    val rows = for {
      i <- 0 until perCluster
      c <- 0 until nClusters
    } yield {
      val z = Array.fill(localRank)(rnd.nextGaussian() * 2.0)
      val off = Array.tabulate(dim)(d =>
        (0 until localRank).foldLeft(0.0)((a, r) => a + z(r) * basis(r)(d)))
      // vec_id = i*nClusters + c → ids 0..15 are one query per cluster
      ((i * nClusters + c).toLong,
        Array.tabulate(dim)(d => centers(c)(d) + off(d).toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding").repartition(4).cache()
  }
  private lazy val exactClustered = KnnSearch.selfTopK(clustered, numQueries = 16, k = 10)
    .select($"query_id", $"vec_id").cache()

  private def recallClustered(ann: DataFrame): Double =
    ann.select($"query_id", $"vec_id")
      .join(exactClustered, Seq("query_id", "vec_id")).count().toDouble /
      exactClustered.count()

  test("clustered fixture: trained residual IVFPQ recall@10 >= 0.9 at nprobe=nlist/4, reference m=d/4") {
    // m = d/4 = 16 subquantizers is the reference's own PQ rule
    // (vector_search_cluster.py:1035); at m=8 the same index measures 0.85
    val r = recallClustered(IvfPqIndex.selfSearchTrained(clustered, numQueries = 16,
      nlist = 16, nprobe = 4, m = 16, subDim = 4, ksub = 64, k = 10))
    info(f"clustered trained IVFPQ recall@10 = $r%.3f")
    assert(r >= 0.9)
  }

  test("clustered fixture: OPQ→IVFPQ composition recall@10 >= plain trained IVFPQ and >= 0.9") {
    // FAISS's OPQ recipe composes with the residual index — the learned
    // rotation must not degrade the trained-IVFPQ quality bar here
    val plain = recallClustered(IvfPqIndex.selfSearchTrained(clustered, numQueries = 16,
      nlist = 16, nprobe = 4, m = 16, subDim = 4, ksub = 64, k = 10))
    val opq = recallClustered(OpqIndex.selfSearchOpqIvfPqTrained(clustered, numQueries = 16,
      nlist = 16, nprobe = 4, m = 16, subDim = 4, ksub = 64, k = 10, iters = 3))
    info(f"clustered recall@10: plain IVFPQ = $plain%.3f, OPQ→IVFPQ = $opq%.3f")
    assert(opq >= plain)
    assert(opq >= 0.9)
  }

  test("clustered fixture: trained PQ raw-ADC recall@10 >= 0.5") {
    // Measured 0.625 under r4's partition-order-dependent train sample;
    // the deterministic orderBy(vec_id) sample (r5) shifts the KMeans
    // init draw and the measured point is 0.556. The floor's job is
    // broken-encoder detection (a garbled LUT/encode sits near 0, a
    // working one in the 0.5–0.65 band on this fixture); the QUALITY bar
    // for the clustered regime is the trained-IVFPQ ≥0.9 gate above.
    val r = recallClustered(PqIndex.selfSearchTrained(clustered, numQueries = 16,
      m = 8, subDim = 8, ksub = 64, k = 10))
    info(f"clustered trained PQ raw-ADC recall@10 = $r%.3f")
    assert(r >= 0.5)
  }

  test("IVF at full probe count equals exact search") {
    val full = IvfIndex.selfSearchSeeded(emb, numQueries = 8, nlist = 16, nprobe = 16, k = 10)
    assert(recall(full) == 1.0)
  }

  test("trained IVF at REFERENCE params (nlist=max(100,sqrt n), nprobe=nlist/8) — measured; nprobe knob reaches >= 0.95") {
    // The reference's own parameter rule (vector_search_cluster.py:548-549,
    // :1027) at the largest local SF: n=2000 → nlist=max(100,44)=100,
    // nprobe=12. The max(100,·) floor makes this a degenerate small-n
    // regime — 20 points/cell on clusterless gaussian data, so a query's
    // 10 true neighbors scatter across ~8+ cells and 12% cell coverage
    // cannot reach the reference's claimed 98.2% (README.md:159, measured
    // at 1B×128d where √n-sized cells hold ~31k points each). Measured
    // curve on this data/index: nprobe 12→0.64, 20→0.73, 32→0.91,
    // 40→0.95, 50→0.97 — recall is cell-coverage-bound (data regime),
    // not implementation-bound. Asserted: the measured floor at reference
    // params holds, AND the same index reaches the reference's quality
    // bar through the same knob the reference exposes (nprobe).
    val big = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    val n = big.count()
    val nlist = math.max(100, math.sqrt(n.toDouble).toInt)
    val nprobe = math.max(1, nlist / 8)
    val exactBig = KnnSearch.selfTopK(big, numQueries = 16, k = 10)
      .select($"query_id", $"vec_id").cache()
    val ex = exactBig.count()
    val cents = IvfIndex.trainCentroids(big, nlist)
    val assignments = IvfIndex.assign(big, cents)
    val q = big.where($"vec_id" < 16)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    def recallAt(np: Int): Double =
      IvfIndex.search(q, cents, assignments, np, 10, excludeSelf = true)
        .select($"query_id", $"vec_id")
        .join(exactBig, Seq("query_id", "vec_id")).count().toDouble / ex
    val atRef = recallAt(nprobe)
    val atHigh = recallAt(40)
    info(f"recall@10: nprobe=$nprobe (reference rule) = $atRef%.3f; nprobe=40 = $atHigh%.3f")
    big.unpersist(); exactBig.unpersist()
    assert(atRef >= 0.6)
    assert(atHigh >= 0.95)
  }
}
