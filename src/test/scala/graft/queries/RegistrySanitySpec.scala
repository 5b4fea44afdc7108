package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Registry wiring guards: every oracle belongs to a query, the
  * no-oracle set is exactly the documented approximate/trained paths,
  * and no Map literal silently swallows a duplicated key (in Scala a
  * later duplicate wins and the earlier entry becomes dead code — the
  * round-1 q_json_props bug class). */
class RegistrySanitySpec extends AnyFunSuite {

  // trained/approximate paths: verified by recall/variance specs, not
  // SQL. Each one ALSO has an oracle-hashed drift companion since r6:
  // q_ivf_trained_knn → q_ivf_medoid_knn
  // (the full iterative train→search pipeline, medoid-snapped);
  // q_pca_reduce → q_pca_norms (orthonormality); q_whiten →
  // q_whiten_stats (Σλ = tr(C)); OPQ dumps the probe0_sq rotation
  // fingerprint. (q_bpe_merges left this set in r6 — its merge rounds
  // are replayed exactly by a chained-CTE DuckDB oracle. q_hnsw_knn and
  // q_vamana_knn left in r9: their exhaustive-beam forms are
  // structurally exact and share the brute-force FLAT oracle.
  // q_hnsw_persisted left in r10: the persisted reload is walked at the
  // same exhaustive beam — load-time reachability patch + entry seed +
  // ef = shard size — so the S4→S3 round-trip hashes against the FLAT
  // oracle too; the production ef = 64 read stays recall-gated via
  // q_recall_report's hnsw row and the q_hnsw_sweep rung pins. The five
  // remaining entries are legitimately permanent: LAPACK/seed-dependent
  // trained transforms, each drift-pinned.)
  // q_minhash_fast_cands joined in r12: the xxhash64 signature/banding
  // half of the fast MinHash family — DuckDB has no xxhash64, so the
  // candidate artifact gets the rows-only check (its QUALITY is
  // recall-gated vs the md5 pipeline in DedupSpec) while the verify
  // stage over it is fully oracled as q_minhash_lsh_fast (the oracle
  // reads the artifact this verify run dumped). Since r13 it also
  // carries a drift pin like the other five: DedupSpec fingerprints the
  // deterministic candidate table at sf0.001 AND sf0.01 (row count +
  // md5 of the canonicalized rows), so a silent candidate-set drift
  // surfaces even when the verified pairs are unchanged.
  private val documentedNoOracle =
    Set("q_ivf_trained_knn", "q_pca_reduce",
      "q_whiten",
      "q_opq_knn", "q_opq_ivfpq_knn",
      "q_minhash_fast_cands")

  test("every oracle key has a matching query") {
    val orphans = Registry.oracleSql.keySet -- Registry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("queries without an oracle are exactly the documented approximate set") {
    val noOracle = Registry.queries.keySet -- Registry.oracleSql.keySet
    assert(noOracle == documentedNoOracle,
      s"undocumented no-oracle queries: ${noOracle -- documentedNoOracle}; " +
        s"stale entries: ${documentedNoOracle -- noOracle}")
  }

  test("no duplicated keys in the Registry source (later dup silently wins)") {
    val src = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        "src/main/scala/graft/queries/Registry.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val keyPattern = """"(q_[a-z0-9_]+)" ->""".r
    val counts = keyPattern.findAllMatchIn(src).map(_.group(1)).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    // each key appears at most twice: once in queries, once in oracleSql
    val dups = counts.filter(_._2 > 2)
    assert(dups.isEmpty, s"keys defined more than twice in source: $dups")
    // and oracle-less keys exactly once
    documentedNoOracle.foreach { k =>
      assert(counts.getOrElse(k, 0) == 1, s"$k should appear exactly once")
    }
  }
}
