package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.functions.Distances
import graft.operators.{Dedup, KnnSearch, Sharding, TopKMerge}

/** Property-based invariants (SURVEY §5.3): merge-of-local-top-k equals
  * global top-k; sharding is a true partition with the remainder rule;
  * distance axioms; jaccard bounds. Spark jobs per sample, so sample
  * counts are small — the properties, not the volume, carry the test. */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def toDF(vecs: List[List[Float]]) = {
    val s = spark
    import s.implicits._
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
      .toDF("vec_id", "embedding")
  }

  private val vecsGen: Gen[List[List[Float]]] = for {
    n <- Gen.chooseNum(6, 20)
    d <- Gen.chooseNum(2, 8)
    vs <- Gen.listOfN(n, Gen.listOfN(d, Gen.chooseNum(-5.0f, 5.0f)))
  } yield vs

  property("shardedTopKMergeEqualsGlobal") = forAll(vecsGen) { vecs =>
    val df = toDF(vecs)
    val k = 3
    val q = math.min(3, vecs.size)
    val merged = TopKMerge.shardedSelfTopK(df, q, k, numShards = 4)
      .select(col("query_id"), col("rank"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val global = KnnSearch.selfTopK(df, q, k)
      .select(col("query_id"), col("rank"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    merged == global
  }

  property("evenSplitIsPartitionWithRemainderRule") = forAll(
    Gen.chooseNum(5, 60), Gen.chooseNum(1, 9)) { (n, shards) =>
    val s = spark
    import s.implicits._
    val df = (0L until n.toLong).toDF("vec_id")
    val rows = Sharding.evenSplit(df, shards, "vec_id")
      .groupBy(col("shard_id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = (0 until shards).map(i => rows.getOrElse(i.toLong, 0L))
    sizes.sum == n &&
      (sizes.max - sizes.min) <= 1 &&
      sizes.zipWithIndex.forall { case (sz, i) =>
        sz == n / shards + (if (i < n % shards) 1 else 0)
      }
  }

  /** The scalable form must equal the window form everywhere — including
    * shards > rows (base == 0: one row per leading shard, rest empty). */
  property("evenSplitScalableEqualsWindowFormIncludingDegenerate") = forAll(
    Gen.chooseNum(1, 30), Gen.chooseNum(1, 40)) { (n, shards) =>
    val s = spark
    import s.implicits._
    val df = (0L until n.toLong).toDF("vec_id")
    val window = Sharding.evenSplit(df, shards, "vec_id")
      .select(col("vec_id"), col("shard_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val scalable = Sharding.evenSplitScalable(df, shards, "vec_id")
      .select(col("vec_id"), col("shard_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    window == scalable
  }

  property("hashShardInRange") = forAll(vecsGen, Gen.chooseNum(1, 16)) { (vecs, n) =>
    val shards = Sharding.withHashShard(toDF(vecs), "embedding", n)
      .select(col("shard_id")).collect().map(_.getLong(0))
    shards.forall(sh => sh >= 0 && sh < n)
  }

  property("l2SqAxioms") = forAll(vecsGen) { vecs =>
    val df = toDF(vecs)
    val self = df.select(Distances.l2SqFast(col("embedding"), col("embedding")).as("d"))
      .collect().map(_.getDouble(0))
    val a = df.where(col("vec_id") === 0).select(col("embedding").as("va"))
    val pair = df.crossJoin(a).select(
      Distances.l2SqFast(col("va"), col("embedding")).as("ab"),
      Distances.l2SqFast(col("embedding"), col("va")).as("ba"))
      .collect()
    self.forall(_ == 0.0) && pair.forall(r => r.getDouble(0) == r.getDouble(1)) &&
      pair.forall(_.getDouble(0) >= 0.0)
  }

  property("cosineSimFusedParity") = forAll(vecsGen) { vecs =>
    // one-pass fused CosineSim must be bit-identical to the three-pass
    // HOF ratio on arbitrary NONZERO float vectors. Zero-norm inputs
    // follow ANSI Divide semantics in BOTH forms (throw under ANSI,
    // NULL otherwise) — that contract is pinned by L2SqDistanceSpec's
    // zero-norm test, so the property excludes them (one throwing row
    // would abort the whole collected batch here, not test parity).
    val nonzero = vecs.filter(_.exists(_ != 0.0f))
    (nonzero.size < 2) || {
      val df = toDF(nonzero)
      val a = df.where(col("vec_id") === 0).select(col("embedding").as("va"))
      val rows = df.crossJoin(a).select(
        Distances.cosineSim(col("va"), col("embedding")).as("hof"),
        Distances.cosineSimFast(col("va"), col("embedding")).as("fused"))
        .collect()
      rows.forall { r =>
        val (h, f) = (r.getDouble(0), r.getDouble(1))
        (h.isNaN && f.isNaN) || h == f
      }
    }
  }

  property("jaccardBoundsAndIdentity") = forAll(
    Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))) { words =>
    val s = spark
    import s.implicits._
    val df = Seq((words.toArray, words.reverse.toArray)).toDF("a", "b")
    val r = df.select(
      Dedup.jaccard(col("a"), col("a")).as("self"),
      Dedup.jaccard(col("a"), col("b")).as("rev")).head()
    r.getDouble(0) == 1.0 && r.getDouble(1) == 1.0
  }

  // random docs over a small shared vocabulary → real shingle overlap
  private val docsGen: Gen[List[String]] = for {
    vocabN <- Gen.chooseNum(4, 8)
    n <- Gen.chooseNum(4, 10)
    docs <- Gen.listOfN(n, Gen.chooseNum(3, 10).flatMap(len =>
      Gen.listOfN(len, Gen.chooseNum(0, vocabN - 1))))
  } yield docs.map(_.map(i => s"w$i").mkString(" "))

  private def docsDF(texts: List[String]) = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, (i % 2).toString, t) }
      .toDF("doc_id", "source", "text")
  }

  /** The round-2 prefix-filter rewrite must find EXACTLY the pairs the
    * all-pairs form finds — the PPJoin completeness theorem, checked
    * empirically on overlapping random corpora. */
  property("prefixFilteredJaccardEqualsAllPairs") = forAll(docsGen) { texts =>
    import graft.functions.TextFunctions
    val docs = docsDF(texts)
    val t = 0.5
    val filtered = Dedup.ngramJaccardDups(docs, "source", 3, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val sh = docs.select(col("doc_id"), col("source").as("block"),
      TextFunctions.wordShingles(col("text"), 3).as("sh"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.block") === col("b.block") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(Dedup.jaccard(col("a.sh"), col("b.sh")), 4).as("jaccard"))
      .where(col("jaccard") >= t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    filtered == brute
  }

  /** Fused corpus-side build loops must equal their HOF forms on random
    * vectors (parity specs cover the real tables; this covers the space). */
  property("fusedArgminAndEncodeMatchHof") = forAll(vecsGen) { vecs =>
    import graft.operators.{IvfIndex, PqIndex}
    val df = toDF(vecs)
    val nlist = math.min(4, vecs.size)
    val cents = IvfIndex.seedCentroids(df, nlist)
    val a1 = IvfIndex.assign(df, cents)
      .select(col("vec_id"), col("cluster_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val a2 = IvfIndex.assignHof(df, cents)
      .select(col("vec_id"), col("cluster_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val d = vecs.head.size
    val subDim = math.max(1, d / 2)
    val m = d / subDim
    val ksub = math.min(3, vecs.size)
    val cb = PqIndex.seedCodebooks(df, m, subDim, ksub)
    val c1 = df.select(PqIndex.encodeExpr(col("embedding"), cb, m, subDim).as("c"))
      .collect().map(_.getSeq[Long](0))
    val c2 = df.select(PqIndex.encodeExprHof(col("embedding"), cb, m, subDim).as("c"))
      .collect().map(_.getSeq[Long](0))
    a1.sameElements(a2) && c1.sameElements(c2)
  }

  /** Growing the train fraction may only ADD docs to train — hash splits
    * never reshuffle existing assignments (the no-leakage property that
    * makes md5 routing safe to resize mid-project). */
  property("hashSplitMonotoneInTrainFraction") = forAll(
    Gen.chooseNum(0.05, 0.45), Gen.chooseNum(0.5, 0.95)) { (f1, f2) =>
    import graft.operators.CorpusOps
    val s = spark
    import s.implicits._
    val docs = (0L until 150L).map(i => (i, "")).toDF("doc_id", "text")
    def train(f: Double): Set[Long] =
      CorpusOps.hashSplit(docs, col("doc_id"), f, 0.0)
        .where(col("split") === "train")
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    train(f1).subsetOf(train(f2))
  }

  /** Chunk windows tile the token stream: each chunk covers
    * min(chunk, n − start) tokens and the last chunk reaches the end —
    * no token is dropped for any (n, chunk, stride ≤ chunk). */
  property("chunkWindowsCoverEveryToken") = forAll(for {
    n <- Gen.chooseNum(1, 120)
    chunk <- Gen.chooseNum(1, 40)
    stride <- Gen.chooseNum(1, chunk)
  } yield (n, chunk, stride)) { case (n, chunk, stride) =>
    import graft.operators.CorpusOps
    val s = spark
    import s.implicits._
    val docs = Seq((1L, (0 until n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = CorpusOps.chunkByTokens(docs, chunk, stride)
      .select(col("chunk_id"), col("chunk_tokens")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val sizesOk = chunks.forall { case (cid, ct) =>
      ct == math.min(chunk.toLong, n - cid * stride) }
    val lastEndsAtN = chunks.last._1 * stride + chunks.last._2 == n
    val startsInRange = chunks.forall { case (cid, _) => cid * stride < n }
    sizesOk && lastEndsAtN && startsInRange
  }

  /** weightedInterleave emits a permutation of its input — mixing
    * reorders, never drops or duplicates. */
  property("weightedInterleaveIsPermutation") = forAll(
    Gen.chooseNum(10, 80), Gen.chooseNum(0.25, 4.0)) { (n, w) =>
    import graft.operators.CorpusOps
    val s = spark
    import s.implicits._
    val docs = (0L until n.toLong).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    val out = CorpusOps.weightedInterleave(docs, Map("a" -> w), default = 1.0)
      .select(col("doc_id")).collect().map(_.getLong(0))
    out.sorted.sameElements(0L until n.toLong)
  }

  // --- fused string expressions vs their HOF reference forms on
  // adversarial generated text (whitespace runs, unicode, empties) ---

  private val textGen: Gen[String] = {
    val piece = Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(6)),
      Gen.oneOf("the", "a", "of", "is", "und", "123", "A1!", "h\u00e9", "\ud83d\ude00"),
      Gen.oneOf(" ", "  ", "\t", "\n", "\r", "\f", "\u000b"))
    Gen.listOf(piece).map(_.mkString)
  }

  property("textStatsEqualsHofForms") = forAll(Gen.listOfN(8, textGen)) { texts =>
    val s = spark
    import s.implicits._
    import graft.functions.TextFunctions
    val df = texts.toDF("text")
    val st = TextFunctions.textStats(col("text"))
    df.select(
      (st.getField("n_tokens") === TextFunctions.tokenCountWs(col("text"))).as("a"),
      (st.getField("n_bpe") === TextFunctions.tokenCountBpe(col("text"))).as("b"),
      (st.getField("alpha") ===
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("long")).as("c"),
      (st.getField("stop_hits") === TextFunctions.wordListHits(
        TextFunctions.tokens(col("text")), TextFunctions.enStopwords)).as("d"),
      (st.getField("char_len") === length(col("text")).cast("long")).as("e"))
      .collect().forall(r => (0 until 5).forall(i => r.getBoolean(i)))
  }

  // --- winnowing (Schleimer et al. 2003) structural guarantees on
  // random word documents: every full window of w consecutive gram
  // positions contains at least one selected fingerprint (the paper's
  // coverage/density theorem — THE property making overlap detection
  // sound), and selections are genuine window minima ---

  private val wordsDocGen: Gen[String] = for {
    // 3..40 words: lengths below k+w-1 = 6 exercise the no-fingerprint
    // branch for real (8+ would leave it dead code)
    n <- Gen.chooseNum(3, 40)
    ws <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"))
  } yield ws.mkString(" ")

  property("winnowingCoversEveryWindow") = forAll(Gen.listOfN(4, wordsDocGen)) { texts =>
    val s = spark
    import s.implicits._
    val k = 3
    val w = 4
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, k = k, w = w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (d, rows) => d -> rows.map(_._2).toSet }
    texts.zipWithIndex.forall { case (t, i) =>
      val toks = t.trim.split("\\s+").toSeq
      val nGrams = toks.length - k + 1
      if (toks.length < k + w - 1) !fps.contains(i.toLong) // sub-window docs emit nothing
      else (0 to nGrams - w).forall { st =>
        // some selected position falls inside window [st, st+w-1]
        fps.getOrElse(i.toLong, Set.empty).exists(p => p >= st && p <= st + w - 1)
      }
    }
  }

  property("ngramWindowsEqualsHofForm") = forAll(Gen.listOfN(6, textGen),
      Gen.chooseNum(1, 4)) { (texts, n) =>
    val s = spark
    import s.implicits._
    import graft.operators.CorpusStats
    texts.toDF("text").select(
      CorpusStats.wordNgrams(col("text"), n).as("fast"),
      CorpusStats.wordNgramsHof(col("text"), n).as("hof"))
      .collect().forall(r => r.getSeq[String](0) == r.getSeq[String](1))
  }

  /** Fagin's TA is a SAFE early termination: on every random corpus and
    * query-term set, its top-k must equal exhaustive BM25 scoring —
    * ranks and doc ids both (the θ/τ bound theorem, checked
    * empirically). */
  property("taTopKEqualsExhaustiveScoring") = forAll(
    docsGen, Gen.chooseNum(1, 3), Gen.chooseNum(1, 6)) { (texts, nTerms, k) =>
    import graft.operators.{Bm25, SparseTopK}
    val docs = docsDF(texts)
    val terms = (0 until nTerms).map(i => s"w$i")
    val idx = SparseTopK.buildImpactIndex(docs).localCheckpoint(true)
    val ta = SparseTopK.taTopK(idx, terms, k)
      .select(col("rank"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val full = Bm25.rank(docs, terms, topN = k).select(col("doc_id")).collect()
      .zipWithIndex.map { case (r, i) => (i + 1L, r.getLong(0)) }.toSeq
    ta == full
  }

  /** Greedy k-center equals the brute-force farthest-point replay —
    * selection order, ids, and the non-increasing radius law. */
  property("kCenterGreedyMatchesBruteForce") = forAll(
    vecsGen, Gen.chooseNum(1, 5)) { (vecs, k0) =>
    import graft.operators.Coreset
    val k = math.min(k0, vecs.size)
    val df = toDF(vecs)
    def l2sq(a: List[Float], b: List[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    val all = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    var sel = Vector(all.head)
    var i = 1
    while (i < k) {
      val best = all.map { case (id, v) => ((id, v), sel.map(s => l2sq(v, s._2)).min) }
        .reduceLeft((a, b) =>
          if (b._2 > a._2 || (b._2 == a._2 && b._1._1 < a._1._1)) b else a)
      sel :+= best._1
      i += 1
    }
    val got = Coreset.kCenterGreedy(df, k)
      .select(col("sel_rank"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dists = Coreset.kCenterGreedy(df, k)
      .orderBy(col("sel_rank")).select(col("dist")).collect().map(_.getDouble(0)).drop(1)
    got == sel.zipWithIndex.map { case ((id, _), r) => (r.toLong, id) } &&
      dists.sliding(2).forall(w => w.length < 2 || w(0) >= w(1))
  }

  /** SQ4 nibble packing is representation-only: unpack(pack(codes))
    * equals the direct clamp formula on every random vector set. */
  property("sq4PackUnpackRoundTrip") = forAll(vecsGen) { vecs =>
    import graft.operators.SqIndex
    val df = toDF(vecs)
    val d = vecs.head.size
    val (vmin, scale) = SqIndex.trainMinMax4(df, d)
    val packed = df.select(col("vec_id"),
        SqIndex.encode4Expr(col("embedding"), vmin, scale).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    vecs.zipWithIndex.forall { case (v, id) =>
      val p = packed(id.toLong)
      (0 until d).forall { i =>
        val expect =
          if (scale(i) == 0.0) 0L
          else math.min(15L, math.max(0L,
            BigDecimal((v(i).toDouble - vmin(i)) / scale(i))
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
        val b = p(i / 2)
        val code = if (i % 2 == 0) b >> 4 else b & 15L
        code == expect
      }
    }
  }

  /** Keyset pagination composes: page1 ++ searchAfter(page1's cursor)
    * equals the single top-2k ranking on every random vector set. */
  property("searchAfterSplitsTheRanking") = forAll(vecsGen) { vecs =>
    import graft.operators.{KnnSearch, ResultShaping}
    val df = toDF(vecs)
    val k = 3
    val q = df.where(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val cands = df.select(col("vec_id"), col("embedding").as("vec"))
    def rows(r: org.apache.spark.sql.DataFrame) = r
      .select(col("query_id"), col("rank"), col("vec_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    val page1 = KnnSearch.topK(q, cands, k = k, excludeSelf = true)
    val cursors = page1.where(col("rank") === k)
      .select(col("query_id"), col("dist").as("after_dist"),
        col("vec_id").as("after_vec_id"))
    val page2 = ResultShaping.searchAfter(q, cands, cursors, k, excludeSelf = true)
      .select(col("query_id"), (col("rank") + k).as("rank"), col("vec_id"))
    val full = rows(KnnSearch.topK(q, cands, k = 2 * k, excludeSelf = true))
    // queries with < k candidates have no cursor — compare their page-1
    // rows only (full == page1 there by construction)
    val qsWithCursor = cursors.select(col("query_id")).collect()
      .map(_.getLong(0)).toSet
    val got = rows(page1) ++ rows(page2)
    full.filter(t => qsWithCursor(t._1)) ==
      got.filter(t => qsWithCursor(t._1)) &&
      full.filter(t => !qsWithCursor(t._1)) ==
        rows(page1).filter(t => !qsWithCursor(t._1))
  }

  /** Grouped top-k equals the greedy reference: scan candidates in
    * (dist, vec_id) order admitting while the group has taken < m, stop
    * at k — the Milvus group_by semantics, checked against a plain
    * Scala replay on every random vector set. */
  property("groupedTopKEqualsGreedyReference") = forAll(vecsGen) { vecs =>
    import graft.operators.ResultShaping
    val df = toDF(vecs).withColumn("label", pmod(col("vec_id"), lit(3L)).cast("int"))
    val k = 4; val m = 2
    val got = ResultShaping.selfSearchGrouped(df, numQueries = 2, k = k, perGroup = m)
      .select(col("query_id"), col("rank"), col("vec_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    // driver-side greedy replay on exact distances
    val byId = vecs.zipWithIndex.map { case (v, i) => i.toLong -> v }.toMap
    def l2(a: List[Float], b: List[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    val expect = (0L until math.min(2, vecs.size).toLong).flatMap { qid =>
      val scored = byId.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (l2(byId(qid), v), id, id % 3) }
        .sortBy(t => (t._1, t._2))
      val taken = scala.collection.mutable.Map.empty[Long, Int]
      val sel = scala.collection.mutable.ArrayBuffer.empty[Long]
      scored.foreach { case (_, id, g) =>
        if (sel.size < k && taken.getOrElse(g, 0) < m) {
          taken(g) = taken.getOrElse(g, 0) + 1; sel += id
        }
      }
      sel.zipWithIndex.map { case (id, r) => (qid, (r + 1).toLong, id) }
    }.toSet
    got == expect
  }

  /** mutualPairs keeps exactly the symmetric edges of any random
    * directed edge table, canonicalized a < b. */
  property("mutualPairsAreTheSymmetricEdges") = forAll(
    Gen.listOf(Gen.zip(Gen.chooseNum(0L, 8L), Gen.chooseNum(0L, 8L)))) { edges0 =>
    import graft.operators.Mining
    val s = spark
    import s.implicits._
    val edges = edges0.filter { case (a, b) => a != b }.distinct
    val df = edges.map { case (a, b) => (a, b, 1.0) }
      .toDF("query_id", "vec_id", "dist")
    val got = Mining.mutualPairs(df)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val set = edges.toSet
    val expect = set.filter { case (a, b) => a < b && set((b, a)) }
    got == expect
  }
}
