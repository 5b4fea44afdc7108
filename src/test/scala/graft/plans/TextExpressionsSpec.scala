package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions
import graft.operators.Dedup

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(50)

  test("fused SimHash64 is identical to the HOF/oracle form on real docs") {
    val both = docs.select(
      Dedup.simhashExpr($"text").as("fast"),
      Dedup.simhashExprHof($"text").as("hof"))
    assert(both.where($"fast" =!= $"hof").count() == 0)
  }

  test("fused JaccardSim is identical to array_intersect/array_union form") {
    val sh = docs.select($"doc_id",
      TextFunctions.wordShingles($"text", 3).as("sh"))
    val pairs = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        Dedup.jaccard(col("a.sh"), col("b.sh")).as("fast"),
        Dedup.jaccardHof(col("a.sh"), col("b.sh")).as("hof"))
    assert(pairs.where($"fast" =!= $"hof").count() == 0)
  }

  test("fused HammingDistance equals the HOF form on simhash pairs") {
    val sh = Dedup.simhash(docs)
    val pairs = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        Dedup.hammingDist(col("a.simhash"), col("b.simhash")).as("fast"),
        Dedup.hammingDistHof(col("a.simhash"), col("b.simhash")).as("hof"))
    assert(pairs.where($"fast" =!= $"hof").count() == 0)
  }

  test("JaccardSim handles duplicates and empties with set semantics") {
    val r = Seq(1).toDF("x").select(
      Dedup.jaccard(typedLit(Array("a", "a", "b")), typedLit(Array("b", "c"))).as("j1"),
      Dedup.jaccard(typedLit(Array.empty[String]), typedLit(Array.empty[String])).as("j2")).head()
    assert(r.getDouble(0) == 1.0 / 3.0)
    assert(r.getDouble(1) == 0.0)
  }

  test("fused ShingleWindows is identical to the HOF shingle form on real docs") {
    val both = spark.read.parquet(s"$sf0001/documents.parquet").select(
      TextFunctions.wordShingles($"text", 3).as("fast"),
      TextFunctions.wordShinglesHof($"text", 3).as("hof"))
    assert(both.where(not($"fast" <=> $"hof")).count() == 0)
    // edge cases: repeats dedup in first-occurrence order; short → empty
    val edge = Seq("a b a b a b", "a b", "").toDF("text").select(
      TextFunctions.wordShingles($"text", 3).as("fast"),
      TextFunctions.wordShinglesHof($"text", 3).as("hof")).collect()
    edge.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    assert(edge(0).getSeq[String](0) == Seq("a b a", "b a b"))
    assert(edge(1).getSeq[String](0).isEmpty)
  }

  test("fused PairWindows is identical to the HOF bigram form on real docs") {
    val both = spark.read.parquet(s"$sf0001/documents.parquet").select(
      TextFunctions.wordBigrams($"text").as("fast"),
      TextFunctions.wordBigramsHof($"text").as("hof"))
    assert(both.where(not($"fast" <=> $"hof")).count() == 0)
    // edge cases: multiplicity preserved; single token / empty → empty
    val edge = Seq("a b a b", "solo", "").toDF("text").select(
      TextFunctions.wordBigrams($"text").as("fast"),
      TextFunctions.wordBigramsHof($"text").as("hof")).collect()
    edge.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    assert(edge(0).getSeq[String](0) == Seq("a b", "b a", "a b"))
    assert(edge(1).getSeq[String](0).isEmpty)
  }

  test("fused TopTokenCount is identical to the HOF form on real docs") {
    val both = spark.read.parquet(s"$sf0001/documents.parquet").select(
      TextFunctions.topTokenCount($"text").as("fast"),
      TextFunctions.topTokenCountHof($"text").as("hof"))
    assert(both.where(not($"fast" <=> $"hof")).count() == 0)
    val edge = Seq("a b a b a", "solo", "x y z").toDF("text").select(
      TextFunctions.topTokenCount($"text").as("fast"),
      TextFunctions.topTokenCountHof($"text").as("hof")).collect()
    edge.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(edge(0).getLong(0) == 3L) // 'a' ×3
    assert(edge(1).getLong(0) == 1L)
    assert(edge(2).getLong(0) == 1L)
  }

  test("fused MinShingleHash is identical to the HOF/oracle fingerprint on real docs") {
    val both = spark.read.parquet(s"$sf0001/documents.parquet").select(
      TextFunctions.docFingerprint($"text", 3).as("fast"),
      TextFunctions.docFingerprintHof($"text", 3).as("hof"))
    assert(both.where(not($"fast" <=> $"hof")).count() == 0)
    // short docs (< n tokens): both forms null
    val short = Seq("one two", "").toDF("text").select(
      TextFunctions.docFingerprint($"text", 3).as("fast"),
      TextFunctions.docFingerprintHof($"text", 3).as("hof")).collect()
    short.foreach(r => assert(r.isNullAt(0) && r.isNullAt(1)))
  }

  test("fused MinHashSignature is identical to the HOF/oracle signature on real docs") {
    val full = spark.read.parquet(s"$sf0001/documents.parquet")
    val fast = Dedup.minhashSignature(full, 3, 16)
      .select($"doc_id", $"sig".as("fast"))
    val hof = Dedup.minhashSignatureHof(full, 3, 16)
      .select($"doc_id", $"sig".as("hof"))
    val joined = fast.join(hof, Seq("doc_id"))
    assert(joined.where(not($"fast" <=> $"hof")).count() == 0)
    // empty shingle set → all-null entries in both forms
    val empty = Seq("too short").toDF("text").withColumn("doc_id", lit(1L))
    val e = Dedup.minhashSignature(empty, 3, 4).select($"sig").head().getSeq[String](0)
    val eh = Dedup.minhashSignatureHof(empty, 3, 4).select($"sig").head().getSeq[String](0)
    assert(e.size == 4 && e.forall(_ == null))
    assert(e == eh)
  }

  test("fused MinHashSignatureFast is identical to the HOF xxhash64 family on real docs") {
    val full = spark.read.parquet(s"$sf0001/documents.parquet")
    val fast = Dedup.minhashSignatureFast(full, 3, 16)
      .select($"doc_id", $"sig".as("fast"))
    val hof = Dedup.minhashSignatureFastHof(full, 3, 16)
      .select($"doc_id", $"sig".as("hof"))
    val joined = fast.join(hof, Seq("doc_id"))
    assert(joined.where(not($"fast" <=> $"hof")).count() == 0)
    // empty shingle set → all-null entries in both forms
    val empty = Seq("too short").toDF("text").withColumn("doc_id", lit(1L))
    val e = Dedup.minhashSignatureFast(empty, 3, 4).select($"sig").head().getSeq[java.lang.Long](0)
    val eh = Dedup.minhashSignatureFastHof(empty, 3, 4).select($"sig").head().getSeq[java.lang.Long](0)
    assert(e.size == 4 && e.forall(_ == null))
    assert(e == eh)
  }

  test("fused TextStats fields equal the multi-pass built-in forms on real docs") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val st = TextFunctions.textStats($"text")
    val both = docs.select(
      st.getField("n_tokens").as("f_ntok"),
      TextFunctions.tokenCountWs($"text").as("h_ntok"),
      st.getField("n_bpe").as("f_bpe"),
      TextFunctions.tokenCountBpe($"text").as("h_bpe"),
      st.getField("len_sum").cast("double").as("f_lsum"),
      aggregate(TextFunctions.tokens($"text"), lit(0L),
        (acc, t) => acc + length(t)).cast("double").as("h_lsum"),
      st.getField("alpha").as("f_alpha"),
      length(regexp_replace($"text", "[^a-z]", "")).cast("long").as("h_alpha"),
      st.getField("stop_hits").as("f_stop"),
      TextFunctions.wordListHits(TextFunctions.tokens($"text"),
        TextFunctions.enStopwords).as("h_stop"),
      st.getField("char_len").as("f_len"),
      length($"text").cast("long").as("h_len"))
    assert(both.where($"f_ntok" =!= $"h_ntok" || $"f_bpe" =!= $"h_bpe" ||
      $"f_lsum" =!= $"h_lsum" || $"f_alpha" =!= $"h_alpha" ||
      $"f_stop" =!= $"h_stop" || $"f_len" =!= $"h_len").count() == 0)
  }

  test("TextStats replicates split(trim, \\s+) edge semantics and the quality score") {
    // empty, space-only, tab-only, leading/trailing tab empties, upper
    // case (BPE counts each char), digits, non-ASCII, stopwords, emoji
    val edge = Seq("", " ", "\t", "\ta b\t", "  the of x  ", "ABC def",
      "h\u00e9llo w\u00f6rld 123 !!", "a\ud83d\ude00b c", "the the the",
      "one\ntwo\rthree").toDF("text")
    val st = TextFunctions.textStats($"text")
    val both = edge.select(
      st.getField("n_tokens").as("f_ntok"),
      TextFunctions.tokenCountWs($"text").as("h_ntok"),
      st.getField("n_bpe").as("f_bpe"),
      TextFunctions.tokenCountBpe($"text").as("h_bpe"),
      st.getField("len_sum").as("f_lsum"),
      aggregate(TextFunctions.tokens($"text"), lit(0L),
        (acc, t) => acc + length(t)).as("h_lsum"),
      st.getField("alpha").as("f_alpha"),
      length(regexp_replace($"text", "[^a-z]", "")).cast("long").as("h_alpha"),
      st.getField("stop_hits").as("f_stop"),
      TextFunctions.wordListHits(TextFunctions.tokens($"text"),
        TextFunctions.enStopwords).as("h_stop"),
      st.getField("char_len").as("f_len"),
      length($"text").cast("long").as("h_len")).collect()
    both.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), s"n_tokens: $r")
      assert(r.getLong(2) == r.getLong(3), s"n_bpe: $r")
      assert(r.getLong(4) == r.getLong(5), s"len_sum: $r")
      assert(r.getLong(6) == r.getLong(7), s"alpha: $r")
      assert(r.getLong(8) == r.getLong(9), s"stop_hits: $r")
      assert(r.getLong(10) == r.getLong(11), s"char_len: $r")
    }
    // quality score: identical on every non-empty text (both forms raise
    // DIVIDE_BY_ZERO on char_len = 0 under ANSI mode — same behavior)
    val q = edge.where(length($"text") > 0).select(
      TextFunctions.qualityScoreFromStats(st).as("f_q"),
      TextFunctions.qualityScore($"text").as("h_q")).collect()
    q.foreach(r => assert(r.getDouble(0) == r.getDouble(1), s"quality: $r"))
  }

  test("fused NgramWindows is identical to the HOF multiplicity n-gram form") {
    import graft.operators.CorpusStats
    val both = spark.read.parquet(s"$sf0001/documents.parquet").select(
      CorpusStats.wordNgrams($"text", 3).as("fast"),
      CorpusStats.wordNgramsHof($"text", 3).as("hof"))
    assert(both.where(not($"fast" <=> $"hof")).count() == 0)
    // multiplicity preserved (unlike ShingleWindows), short docs → empty
    val edge = Seq("a b a b a b", "a b", "").toDF("text").select(
      CorpusStats.wordNgrams($"text", 3).as("fast"),
      CorpusStats.wordNgramsHof($"text", 3).as("hof")).collect()
    edge.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    assert(edge(0).getSeq[String](0) ==
      Seq("a b a", "b a b", "a b a", "b a b"))
    assert(edge(1).getSeq[String](0).isEmpty)
  }
}
