package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "src0"),
    (2L, "the quick brown fox jumps over the lazy dog", "src0"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat", "src0"), // near dup of 1
    (4L, "completely different words in this entry here now", "src1"))
    .toDF("doc_id", "text", "source")

  test("exactDedup groups identical texts, canonical is min id") {
    val got = Dedup.exactDedup(docs).orderBy($"doc_id").collect()
    assert(got.map(_.getAs[Boolean]("is_dup")).toSeq == Seq(false, true, false, false))
    assert(got(1).getAs[Long]("canonical_id") == 1L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashLshDups(docs, shingleN = 3, numHashes = 16,
      bands = 4, threshold = 0.5)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("identical docs have identical minhash signatures and jaccard 1") {
    val sigs = Dedup.minhashSignature(docs, 3, 16)
      .select($"doc_id", $"sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
  }

  test("fast xxhash64 LSH family: exact dups always caught; verified-output recall vs md5 pipeline on the fixture") {
    // unit shape: exact dups share EVERY minhash under any family, so
    // they co-bucket in every band — guaranteed candidates
    val fastPairs = Dedup.minhashLshDupsFast(docs, shingleN = 3,
        numHashes = 16, bands = 4, threshold = 0.5)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fastPairs.contains((1L, 2L)))
    assert(!fastPairs.exists(p => p._1 == 4L || p._2 == 4L))
    // corpus gate: both pipelines exact-verify (precision 1 by
    // construction); the fast family may co-bucket j < 1 pairs
    // differently, so gate its verified-output recall against the md5
    // pipeline on the real fixture (deterministic per fixture)
    val fixture = spark.read.parquet(s"$sf0001/documents.parquet")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_a", $"doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val md5P = pairSet(Dedup.minhashLshDups(fixture))
    val fastP = pairSet(Dedup.minhashLshDupsFast(fixture))
    val recall =
      if (md5P.isEmpty) 1.0
      else (fastP intersect md5P).size.toDouble / md5P.size
    info(f"md5 pairs=${md5P.size} fast pairs=${fastP.size} recall=$recall%.3f")
    assert(recall >= 0.9,
      s"fast-family verified output must recover >=90% of the md5 pipeline's pairs, got $recall")
  }

  test("candidateShingles: semi-join pruned to candidate ids (plan + output) — verify never shingles the corpus") {
    import org.apache.spark.sql.catalyst.plans.LeftSemi
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    // the plan gate: shingling happens on the SURVIVORS of a left-semi
    // join, so verify cost is O(candidates) — the corpus-wide shingle
    // regression (34.6 s of a ~68 s pipeline at 500k docs, SCALE.md
    // round-12) must not come back. A bare contains("LeftSemi") is too
    // weak (a regression that shingles the corpus and THEN semi-joins
    // also contains LeftSemi — ADVICE r12), so gate the ORDERING: the
    // semi join exists AND no ShingleWindows expression is computed
    // anywhere below it.
    def semiJoinsBelowShingling(plan: LogicalPlan): Unit = {
      val semis = plan.collect { case j: Join if j.joinType == LeftSemi => j }
      assert(semis.nonEmpty,
        "docs must be semi-join pruned to candidate ids before shingling")
      val shingleBelowSemi = semis.exists(_.children.exists(_.exists(node =>
        node.expressions.exists(_.exists(_.isInstanceOf[graft.plans.ShingleWindows])))))
      assert(!shingleBelowSemi,
        "shingling must run on the semi join's SURVIVORS — a ShingleWindows below " +
          "the LeftSemi means the corpus is shingled before pruning")
      val shingleAnywhere = plan.exists(node =>
        node.expressions.exists(_.exists(_.isInstanceOf[graft.plans.ShingleWindows])))
      assert(shingleAnywhere, "the pruned plan must still compute shingles (above the semi join)")
    }
    val scored = Seq((1L, 2L, 1.0)).toDF("doc_a", "doc_b", "est_jaccard")
    val sh = Dedup.candidateShingles(docs, scored, 3, "text")
    semiJoinsBelowShingling(sh.queryExecution.optimizedPlan)
    val got = sh.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L), s"only candidate docs shingled, got $got")
    // and the FULL verify plan (now a lazy transformation — ADVICE r12)
    // carries the same ordering end-to-end: this is the plan the
    // Registry's q_minhash_lsh_fast actually executes
    val verify = Dedup.verifyScoredCandidates(docs, scored, shingleN = 3, threshold = 0.5)
    semiJoinsBelowShingling(verify.queryExecution.optimizedPlan)
    assert(verify.count() >= 1) // (1,2) are exact dups — survive any threshold
  }

  test("replica collapse: collapsed candidate generation is row-identical to direct banding") {
    // r13 verdict item 2 — the band join must pay per DISTINCT text,
    // not per doc, without changing a single output row. The fixture
    // stresses every closure case: verbatim groups of size 2 and 3 with
    // INTERLEAVED ids (least/greatest re-orientation), a cross-group
    // near-dup pair, singletons, an identical-text empty-shingle group
    // and two DIFFERENT-text empty-shingle singletons (all-null sigs
    // co-bucket with est 0 — the degenerate case direct banding emits
    // and the closure must reproduce).
    val fx = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "pack my box with five dozen brown liquor jugs"),
      (3L, "the quick brown fox jumps over the lazy dog today"), // near-dup of group A
      (5L, "the quick brown fox jumps over the lazy dog tonight"), // = 1
      (6L, "pack my box with five dozen brown liquor jugs"), // = 2
      (7L, "completely unrelated text about vector search engines"),
      (9L, "the quick brown fox jumps over the lazy dog tonight"), // = 1
      (10L, "tiny doc"), // empty shingles
      (11L, "tiny doc"), // empty shingles, = 10
      (12L, "small one")) // empty shingles, unique text
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.select($"doc_a", $"doc_b", $"est_jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = rows(Dedup.minhashFastCandidatesScoredDirect(fx))
    val collapsed = rows(Dedup.minhashFastCandidatesScored(fx))
    assert(collapsed == direct,
      s"collapse changed the candidate rows:\n only direct: ${direct -- collapsed}\n only collapsed: ${collapsed -- direct}")
    // pin BOTH regime branches on the same fixture (forced — the
    // adaptive switch must be row-invisible in either direction)
    val sigsAll = Dedup.minhashCollapsedSigs(fx, 3, 16, "text")
    val forcedCollapse = rows(Dedup.collapsedScoredCandidates(
      sigsAll, numHashes = 16, bands = 4, forceCollapse = Some(true)))
    val forcedDirect = rows(Dedup.collapsedScoredCandidates(
      sigsAll, numHashes = 16, bands = 4, forceCollapse = Some(false)))
    assert(forcedCollapse == direct && forcedDirect == direct,
      "the regime switch changed rows in one of its branches")
    // the cases actually occurred: a within-group pair (1,5), a
    // re-oriented cross pair touching a non-rep member (5 or 9 with 3),
    // and the empty-shingle group pair at est 0
    assert(collapsed.exists(p => p._1 == 1L && p._2 == 5L && p._3 == 1.0))
    assert(collapsed.exists(p => (p._1 == 3L && p._2 >= 5L) || (p._1 <= 3L && p._2 == 9L)))
    assert(collapsed.exists(p => p._1 == 10L && p._2 == 11L && p._3 == 0.0))
    // and the FULL pipeline (verify included) is equally unchanged
    val fullDirect = rows(Dedup.verifyScoredCandidates(fx,
        Dedup.minhashFastCandidatesScoredDirect(fx).localCheckpoint(true),
        shingleN = 3, threshold = 0.5)
      .select($"doc_a", $"doc_b", $"est_jaccard"))
    val fullCollapsed = rows(Dedup.minhashLshDupsFast(fx, threshold = 0.5)
      .select($"doc_a", $"doc_b", $"est_jaccard"))
    assert(fullCollapsed == fullDirect, "verified pairs changed under the collapse")
  }

  test("verbatim-pair verify bypass: verifyScoredCandidates equals the exact-only form on a cloud-heavy fixture") {
    // r15: equal-md5 pairs with shingles score 1.0 without the
    // shingle-intersection join; everything else (near-dups, the
    // empty-shingle identical group, unrelated pairs) keeps the exact
    // path. The fixture reuses the collapse spec's closure cases —
    // verbatim clouds, a near-dup pair, empty-shingle groups.
    val fx = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "pack my box with five dozen brown liquor jugs"),
      (3L, "the quick brown fox jumps over the lazy dog today"),
      (5L, "the quick brown fox jumps over the lazy dog tonight"),
      (6L, "pack my box with five dozen brown liquor jugs"),
      (7L, "completely unrelated text about vector search engines"),
      (9L, "the quick brown fox jumps over the lazy dog tonight"),
      (10L, "tiny doc"),
      (11L, "tiny doc"),
      (12L, "small one"))
      .toDF("doc_id", "text")
    val scored = Dedup.minhashFastCandidatesScored(fx).localCheckpoint(true)
    // the pre-r15 exact-only reference form, inlined
    val candIds = scored.select($"doc_a".as("doc_id"))
      .unionByName(scored.select($"doc_b".as("doc_id"))).distinct()
    val sh = fx.join(candIds, Seq("doc_id"), "left_semi")
      .select($"doc_id",
        graft.functions.TextFunctions.wordShingles($"text", 3).as("sh"))
    val reference = scored
      .join(sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), Seq("doc_a"))
      .join(sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), Seq("doc_b"))
      .select($"doc_a", $"doc_b", $"est_jaccard",
        round(Dedup.jaccard($"sh_a", $"sh_b"), 4).as("jaccard"))
      .where($"jaccard" >= 0.8)
      .collect().map(_.toSeq).toSet
    val bypass = Dedup.verifyScoredCandidates(fx, scored, 3, 0.8)
      .collect().map(_.toSeq).toSet
    assert(bypass == reference,
      s"bypass changed verify rows:\n only ref: ${reference -- bypass}\n only bypass: ${bypass -- reference}")
    assert(bypass.nonEmpty, "fixture must exercise the verify output")
  }

  test("q_minhash_fast_cands drift pin: the deterministic candidate artifact's fingerprint at sf0.001 and sf0.01") {
    // the 6th no-oracle entry's drift companion (r12 verdict item 3):
    // the candidate table is fully deterministic (xxhash64 family, fixed
    // knobs), so a silent drift in banding/scoring surfaces HERE even if
    // it leaves the verified pairs unchanged. Same discipline as the
    // q_vamana_medoids / OPQ-rotation fingerprints.
    def pinOf(dir: String): (Long, String) = {
      val rows = Dedup.minhashFastCandidatesScored(
          spark.read.parquet(s"$dir/documents.parquet"),
          shingleN = 3, numHashes = 16, bands = 4)
        .orderBy($"doc_a", $"doc_b").collect()
        .map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.getDouble(2)}")
      val md = java.security.MessageDigest.getInstance("MD5")
      (rows.length.toLong,
       md.digest(rows.mkString("\n").getBytes("UTF-8"))
         .map("%02x".format(_)).mkString)
    }
    val (n1, h1) = pinOf(sf0001)
    val (n2, h2) = pinOf("/root/testdata/sf0.01")
    info(s"sf0.001: n=$n1 md5=$h1; sf0.01: n=$n2 md5=$h2")
    assert((n1, h1) == (26L, "b222a22082ff89123dc93b4f4646ac5d"),
      s"sf0.001 candidate artifact drifted: n=$n1 md5=$h1")
    assert((n2, h2) == (24L, "cbc85b41f34c0e69141695e44edef093"),
      s"sf0.01 candidate artifact drifted: n=$n2 md5=$h2")
  }

  test("duplicateSpans: maximal shared token spans with positions, no false positives") {
    val spanDocs = Seq(
      // docs 10/11 share the 6-token span "a b c d e f" at offsets 0 and 2
      (10L, "a b c d e f g h"),
      (11L, "x y a b c d e f q"),
      // doc 12 shares nothing ≥ 3 tokens with anyone
      (12L, "p q r s t u v w"),
      // docs 13/14 share TWO disjoint spans: "m n o" (3) and "u1 u2 u3 u4" (4)
      (13L, "m n o zz u1 u2 u3 u4"),
      (14L, "m n o kk ll u1 u2 u3 u4"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(spanDocs, minTokens = 3)
      .orderBy($"doc_a", $"doc_b", $"start_a", $"start_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (10L, 11L, 0L, 2L, 6L),   // maximal: one 6-token span, not four 3-token seeds
      (13L, 14L, 0L, 0L, 3L),   // "m n o"
      (13L, 14L, 4L, 5L, 4L)))  // "u1 u2 u3 u4"
    // raising the threshold drops the short span but keeps the long ones
    val k4 = Dedup.duplicateSpans(spanDocs, minTokens = 4)
      .select($"doc_a", $"doc_b", $"len_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(k4 == Set((10L, 11L, 6L), (13L, 14L, 4L)))
  }

  test("duplicateSpans: boilerplate spam cap drops hot-gram spans, keeps rare ones") {
    // "tpl1..tpl3" is template chrome shared by ALL four docs (df=4);
    // "rare1..rare3" is a genuine duplicate between two docs only
    val docs4 = Seq(
      (30L, "tpl1 tpl2 tpl3 aa bb cc"),
      (31L, "tpl1 tpl2 tpl3 dd ee ff"),
      (32L, "tpl1 tpl2 tpl3 rare1 rare2 rare3 gg"),
      (33L, "hh tpl1 tpl2 tpl3 rare1 rare2 rare3"))
      .toDF("doc_id", "text")
    val uncapped = Dedup.duplicateSpans(docs4, minTokens = 3)
    assert(uncapped.count() > 1) // template spans pair everything with everything
    val capped = Dedup.duplicateSpans(docs4, minTokens = 3, maxGramDocFreq = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // only the genuine rare duplicate survives; the all-template pairs
    // vanish entirely, and the surviving span loses exactly the one
    // pure-template seed gram (df=4) while its template→rare boundary
    // grams (df=2) keep the run alive — "tpl2 tpl3 rare1 rare2 rare3"
    assert(capped.toSeq == Seq((32L, 33L, 1L, 2L, 5L)))
  }

  test("cutSpans: keep-first removal — later doc loses the span, earlier keeps it") {
    val spanDocs = Seq(
      (10L, "a b c d e f g h"),
      (11L, "x y a b c d e f q"),       // loses "a b c d e f"
      (12L, "p q r s t u v w"),          // untouched
      (13L, "m n o zz u1 u2 u3 u4"),
      (14L, "m n o kk ll u1 u2 u3 u4")) // loses both spans (disjoint merge)
      .toDF("doc_id", "text")
    val cleaned = Dedup.cutSpans(spanDocs, Dedup.duplicateSpans(spanDocs, minTokens = 3))
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(cleaned.toSeq == Seq(
      (10L, "a b c d e f g h", 0L),     // earlier doc of the pair: intact
      (11L, "x y q", 6L),
      (12L, "p q r s t u v w", 0L),
      (13L, "m n o zz u1 u2 u3 u4", 0L),
      (14L, "kk ll", 7L)))
  }

  test("cutSpans: overlapping spans merge before cutting") {
    // doc 23 (the LATEST id — the cut side of both pairs) shares
    // "a b c d" with 20 and "c d e f" with 22: its cut intervals [2,6)
    // and [4,8) overlap and must merge to [2,8)
    val docs3 = Seq(
      (20L, "a b c d zz1 zz2 zz3"),
      (22L, "c d e f yy1 yy2 yy3"),
      (23L, "q r a b c d e f s t"))
      .toDF("doc_id", "text")
    val cleaned = Dedup.cutSpans(docs3, Dedup.duplicateSpans(docs3, minTokens = 4))
      .where($"doc_id" === 23L).head()
    assert(cleaned.getString(1) == "q r s t" && cleaned.getLong(2) == 6L)
  }

  test("ngram jaccard within source block") {
    val got = Dedup.ngramJaccardDups(docs, "source", shingleN = 3, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
    assert(got.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
  }

  test("simhash: identical docs collide, hamming 0; different docs differ") {
    val sh = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sh(1L).length == 64 && sh(1L).forall(c => c == '0' || c == '1'))
    assert(sh(1L) == sh(2L))
    assert(sh(1L) != sh(4L))
    val pairs = Dedup.simhashDups(docs, maxHamming = 2).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("winnowing guarantee: docs sharing a >= w+k-1 token substring share a fingerprint") {
    import spark.implicits._
    // shared run of 7 tokens (= w+k-1 at k=4, w=4) embedded in different contexts
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"one two three $shared four five six seven eight"),
      (2L, s"red blue green yellow $shared purple orange pink brown"),
      (3L, "completely different words with no overlap at all whatsoever here today"))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, k = 4, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "a shared w+k-1 substring must yield at least one shared fingerprint")
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty,
      "disjoint vocab must share no fingerprints")
    // density: selected positions are a strict subset of gram positions
    assert(byDoc(1L).size < 10)
  }

  test("pairQualityReport: exact identity pair is a hit; per-mille math is integer-exact") {
    val cand = Dedup.simhashDups(docs, maxHamming = 2)
      .select($"doc_a", $"doc_b")
    val exact = Dedup.ngramJaccardDups(docs, blockCol = "source",
        shingleN = 3, threshold = 0.5)
      .select($"doc_a", $"doc_b")
    val r = Dedup.pairQualityReport(cand, exact).head()
    val (nc, ne, nh) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // the exact dup (1,2) must be in both sets
    assert(nh >= 1 && nc >= nh && ne >= nh)
    assert(r.getLong(3) == nh * 1000 / nc, "precision_pm = floor(1000*hit/cand)")
    assert(r.getLong(4) == nh * 1000 / ne, "recall_pm = floor(1000*hit/exact)")
  }

  test("pairQualityReport counts candidate-only and truth-only pairs separately") {
    import spark.implicits._
    val cand = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")     // one hit, one false positive
    val exact = Seq((1L, 2L), (5L, 6L)).toDF("doc_a", "doc_b")    // one hit, one miss
    val r = Dedup.pairQualityReport(cand, exact).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 2L, 1L)))
    assert(r.getLong(3) == 500L && r.getLong(4) == 500L)
  }

  test("band ladder nests: coarser-band candidates are a subset of finer-band candidates") {
    // a collision on a longer slice (fewer bands) forces equality of its
    // sub-slices, so candidates(2) ⊆ candidates(4) ⊆ candidates(8) on
    // the same 16-hash signature — the monotonicity q_minhash_sweep plots
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
    val sigs = Dedup.minhashSignature(corpus, shingleN = 3, numHashes = 16)
      .localCheckpoint(true)
    def cands(b: Int) = Dedup.lshCandidates(sigs, b, 16 / b)
      .select($"doc_a", $"doc_b")
    val c2 = cands(2); val c4 = cands(4); val c8 = cands(8)
    assert(c2.exceptAll(c4).isEmpty, "bands=2 pairs must all appear at bands=4")
    assert(c4.exceptAll(c8).isEmpty, "bands=4 pairs must all appear at bands=8")
    assert(c2.count() <= c4.count() && c4.count() <= c8.count())
  }
}
