package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("incrementalDedup drops seen hashes and within-batch duplicates") {
    val seen = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha"), // seen in corpus → dropped
      (11L, "gamma"), // new → kept
      (12L, "gamma"), // within-batch dup → dropped
      (13L, "delta")  // new → kept
    ).toDF("doc_id", "text")
    val out = CorpusOps.incrementalDedup(batch, seen)
      .select($"doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(11L, 13L))
  }

  test("incrementalDedupBloom equals the exact anti-join form on real docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val seen = docs.where($"doc_id" < 250)
    val batch = docs.where($"doc_id" >= 250)
    val exact = CorpusOps.incrementalDedup(batch, seen)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    val bloomed = CorpusOps.incrementalDedupBloom(batch, seen)
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(bloomed == exact && exact.nonEmpty)
  }

  test("deterministicShuffle is a reproducible permutation") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = CorpusOps.deterministicShuffle(docs).select($"doc_id").as[Long].collect()
    val b = CorpusOps.deterministicShuffle(docs).select($"doc_id").as[Long].collect()
    assert(a.sameElements(b))
    assert(a.sorted.toSeq == docs.select($"doc_id").as[Long].collect().sorted.toSeq)
    assert(!a.sameElements(a.sorted)) // it actually permutes
  }

  test("sourceQuota keeps the first N per source in doc_id order") {
    val docs = (0L until 20L).map(i => (i, s"s${i % 2}", s"doc $i"))
      .toDF("doc_id", "source", "text")
    val out = CorpusOps.sourceQuota(docs, quota = 3)
      .select($"doc_id", $"source").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((0L, "s0"), (1L, "s1"), (2L, "s0"),
      (3L, "s1"), (4L, "s0"), (5L, "s1")))
  }

  test("packByTokens bins by exclusive cumulative token count within (source, subshard)") {
    // one source, one subshard (subShards = 1): docs of 3 tokens each,
    // budget 5 → priors 0,3,6,9 → bins 0,0,1,1
    val docs = (0L until 4L).map(i => (i, "s", "a b c"))
      .toDF("doc_id", "source", "text")
    val out = CorpusOps.packByTokens(docs, budget = 5, subShards = 1)
      .select($"doc_id", $"n_tokens", $"bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq == Seq((0L, 3L, 0L), (1L, 3L, 0L), (2L, 3L, 1L), (3L, 3L, 1L)))
  }

  test("hashSplit fractions land near target and are key-deterministic") {
    val docs = (0L until 20000L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val split = CorpusOps.hashSplit(docs, col("doc_id"), 0.8, 0.1)
    val counts = split.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 16000.0) < 400)
    assert(math.abs(counts("val") - 2000.0) < 200)
    assert(math.abs(counts("test") - 2000.0) < 200)
    // pure function of the key: same assignment after repartition
    val again = CorpusOps.hashSplit(docs.repartition(13), col("doc_id"), 0.8, 0.1)
      .select($"doc_id", $"split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = split.select($"doc_id", $"split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first == again)
  }

  test("hashSplit edge fractions: 1.0 keeps everything in train") {
    val docs = (0L until 100L).map(i => (i, "")).toDF("doc_id", "text")
    val all = CorpusOps.hashSplit(docs, col("doc_id"), 1.0, 0.0)
      .groupBy($"split").count().collect()
    assert(all.length == 1 && all(0).getString(0) == "train")
  }

  test("stratifiedSample keeps per-stratum fractions") {
    val docs = (0L until 30000L).map(i =>
      (i, if (i % 3 == 0) "web" else if (i % 3 == 1) "wiki" else "books"))
      .toDF("doc_id", "source")
    val out = CorpusOps.stratifiedSample(docs, col("doc_id"), col("source"),
      Map("web" -> 0.25, "wiki" -> 1.0), default = 0.5)
    val counts = out.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("web") - 2500.0) < 250)   // 10000 × 0.25
    assert(counts("wiki") == 10000L)                 // frac 1.0 = all
    assert(math.abs(counts("books") - 5000.0) < 300) // default 0.5
  }

  test("qualityFilter keeps the top (1-pct) of the corpus; approx tracks exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    val exact = CorpusOps.qualityFilter(docs, pct = 0.25, exact = true)
    val kept = exact.count()
    assert(kept >= (0.70 * n).toLong && kept <= (0.80 * n).toLong,
      s"kept $kept of $n")
    val approx = CorpusOps.qualityFilter(docs, pct = 0.25).count()
    assert(math.abs(approx - kept) <= 0.05 * n)
  }

  test("decontaminate flags docs sharing an n-gram with the benchmark") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x alpha beta gamma delta y"), // contains the benchmark 4-gram
      (2L, "alpha beta gamma zeta"),      // only a 3-gram overlap → clean
      (3L, "unrelated words entirely here")
    ).toDF("doc_id", "text")
    val got = CorpusOps.decontaminate(train, bench, n = 4).collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("is_contaminated"))).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("weightedInterleave orders sources proportionally to weight") {
    val docs = (0L until 3000L).map(i =>
      (i, if (i % 3 == 0) "heavy" else if (i % 3 == 1) "light" else "mid"))
      .toDF("doc_id", "source")
    val out = CorpusOps.weightedInterleave(docs,
        Map("heavy" -> 4.0, "light" -> 1.0), default = 2.0)
      .select($"source").collect().map(_.getString(0))
    // in any prefix, counts should track weights 4:2:1 (heavy:mid:light)
    val prefix = out.take(700)
    val c = prefix.groupBy(identity).view.mapValues(_.length).toMap
    assert(c("heavy") > 2.5 * c("light"), s"counts $c")
    assert(c("mid") > 1.3 * c("light") && c("heavy") > 1.3 * c("mid"), s"counts $c")
    // deterministic: same order every run
    val again = CorpusOps.weightedInterleave(docs.repartition(7),
        Map("heavy" -> 4.0, "light" -> 1.0), default = 2.0)
      .select($"doc_id").collect().map(_.getLong(0))
    val first = CorpusOps.weightedInterleave(docs,
        Map("heavy" -> 4.0, "light" -> 1.0), default = 2.0)
      .select($"doc_id").collect().map(_.getLong(0))
    assert(first.sameElements(again))
  }

  test("chunkByTokens covers every token with stride overlap") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = CorpusOps.chunkByTokens(docs, chunkTokens = 32, strideTokens = 24)
      .orderBy($"chunk_id")
      .select($"chunk_id", $"chunk_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // n=100: starts 0,24,48,72 → last window covers tokens 73..100 (28)
    assert(chunks.toSeq == Seq((0L, 32L), (1L, 32L), (2L, 32L), (3L, 28L)))
    // coverage: last start + window reaches the end
    assert(72 + 28 == 100)
  }

  test("chunkByTokens yields one short chunk for docs below the window") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val chunks = CorpusOps.chunkByTokens(docs, 32, 24).collect()
    assert(chunks.length == 1 && chunks(0).getAs[Long]("chunk_tokens") == 3L)
  }

  test("packByTokens parallelism: bins are independent per subshard") {
    val docs = (0L until 8L).map(i => (i, "s", "a b"))
      .toDF("doc_id", "source", "text")
    val out = CorpusOps.packByTokens(docs, budget = 4, subShards = 2)
      .select($"doc_id", $"subshard", $"bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // evens (subshard 0) and odds (subshard 1) each pack 2-token docs:
    // priors 0,2,4,6 → bins 0,0,1,1 within each stream
    val bySub = out.groupBy(_._2)
    bySub.values.foreach { docsInSub =>
      assert(docsInSub.sortBy(_._1).map(_._3).toSeq == Seq(0L, 0L, 1L, 1L))
    }
  }

  test("temperatureSample: alpha=0.5 flattens the mixture; the cap never repeats a doc") {
    // big: 100 docs, small: 10 docs. alpha=0.5 -> shares 10 : sqrt(10),
    // T=50 -> big floor(50*10/13.162)=37, small min(floor(12.01), 10)=10
    // (the UniMax cap engages). Natural sampling would give small ~4.5.
    val docs = ((0 until 100).map(i => (i.toLong, "big", s"text $i")) ++
      (100 until 110).map(i => (i.toLong, "small", s"text $i")))
      .toDF("doc_id", "source", "text")
    val got = CorpusOps.temperatureSample(docs, totalBudget = 50, alpha = 0.5)
    val bySource = got.groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource == Map("big" -> 37L, "small" -> 10L), s"got $bySource")
    // no repeats: every sampled doc_id is distinct
    assert(got.select($"doc_id").distinct().count() == 47)
    // deterministic across runs
    val again = CorpusOps.temperatureSample(docs, totalBudget = 50, alpha = 0.5)
      .select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again == got.select($"doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("decontaminateBloom equals the exact path on a planted-contamination fixture") {
    // 3 of 8 train docs verbatim-contain a benchmark 8-gram
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "clean text one with plenty of ordinary words in it for sure"),
      (2L, "prefix the quick brown fox jumps over the lazy dog suffix here"),
      (3L, "another clean document that shares no long run with the benchmark"),
      (4L, "quick brown fox jumps over the lazy dog tonight indeed truly"),
      (5L, "clean five six seven eight nine ten eleven twelve thirteen fourteen"),
      (6L, "the quick brown fox jumps over the lazy dog tonight again"),
      (7L, "totally unrelated content goes here with many harmless tokens present"),
      (8L, "nothing to see in this one either just plain words"))
      .toDF("doc_id", "text")
    def verdicts(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"is_contaminated").collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
    val exact = verdicts(CorpusOps.decontaminate(train, bench, n = 8))
    val bloom = verdicts(CorpusOps.decontaminateBloom(train, bench, n = 8))
    assert(bloom == exact)
    assert(exact.filter(_._2).map(_._1) == Seq(2L, 4L, 6L))
  }

  test("weightedSample: ranks are 1..k, zero-weight rows excluded, tokens-heavy docs overrepresented") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val weight = graft.functions.TextFunctions.tokenCountWs($"text")
    val sample = CorpusOps.weightedSample(docs, weight, k = 20).collect()
    assert(sample.map(_.getLong(0)).toSeq == (1L to 20L))
    assert(sample.forall(_.getLong(2) > 0))
    // A-ES draws ∝ weight: the sampled docs' mean token count must
    // exceed the corpus mean (deterministic given the fixed seed/data)
    val corpusMean = docs.agg(avg(weight)).head().getDouble(0)
    val sampleMean = sample.map(_.getLong(2).toDouble).sum / sample.length
    info(f"corpus mean tokens $corpusMean%.1f, sample mean $sampleMean%.1f")
    assert(sampleMean > corpusMean)
  }

  test("corpusDiff classifies added/removed/changed and drops unchanged") {
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val nw = Seq((2L, "beta"), (3L, "gamma EDITED"), (4L, "delta")).toDF("doc_id", "text")
    val got = CorpusOps.corpusDiff(old, nw).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("mlmMask: deterministic, ~15% selection, 80/10/10 actions, replacement semantics hold") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = CorpusOps.mlmMask(docs).collect()
    val b = CorpusOps.mlmMask(docs).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "draw must be reproducible")
    val totalTokens = docs.select(
      sum(size(graft.functions.TextFunctions.tokens($"text")))).head().getLong(0)
    val frac = a.length.toDouble / totalTokens
    info(f"selected $frac%.4f of tokens (target 0.15)")
    assert(math.abs(frac - 0.15) < 0.02)
    val byAction = a.groupBy(_.getString(3)).view.mapValues(_.length.toDouble / a.length).toMap
    info(s"action mix: $byAction")
    assert(math.abs(byAction("mask") - 0.8) < 0.05)
    assert(math.abs(byAction.getOrElse("random", 0.0) - 0.1) < 0.05)
    assert(math.abs(byAction.getOrElse("keep", 0.0) - 0.1) < 0.05)
    val vocab = docs.select(explode(graft.functions.TextFunctions.tokens($"text")))
      .distinct().collect().map(_.getString(0)).toSet
    a.foreach { r =>
      val (tok, act, rep) = (r.getString(2), r.getString(3), r.getString(4))
      act match {
        case "mask" => assert(rep == "[MASK]")
        case "keep" => assert(rep == tok)
        case "random" => assert(vocab.contains(rep))
      }
    }
  }
}
