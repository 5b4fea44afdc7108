package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE corpus (Sennrich et al. 2016): word frequencies
  // low×5, lower×2, newest×6, widest×3 — merge table derived by hand
  private def corpus = Seq(
    (0L, (("low " * 5) + ("lower " * 2) + ("newest " * 6) + ("widest " * 3)).trim))
    .toDF("doc_id", "text")

  test("learns the classic merge table in order with deterministic ties") {
    val got = BpeTrain.train(corpus, numMerges = 8)
    val expected = Seq(
      (1L, "e", "s", 9L),   // tie with (s,t) at 9 → left asc
      (2L, "es", "t", 9L),
      (3L, "l", "o", 7L),   // tie with (o,w) at 7 → left asc
      (4L, "lo", "w", 7L),
      (5L, "e", "w", 6L),   // tie with (n,e),(w,est) at 6 → left asc
      (6L, "ew", "est", 6L),
      (7L, "n", "ewest", 6L),
      (8L, "d", "est", 3L)) // tie with (i,d),(w,i) at 3 → left asc
    assert(got.map(m => (m.rank, m.left, m.right, m.pairCount)) == expected)
  }

  test("applyMerge is left-to-right non-overlapping: aaa + (a,a) = [aa, a]") {
    val df = Seq(Tuple1(Array("a", "a", "a")))
      .toDF("syms")
      .select(BpeTrain.applyMerge(col("syms"), "a", "a").as("out"))
    assert(df.head.getSeq[String](0) == Seq("aa", "a"))
  }

  test("encodeExpr tokenizes an unseen word with the learned merges") {
    val merges = BpeTrain.train(corpus, numMerges = 8)
    val got = Seq(Tuple1("lowest")).toDF("w")
      .select(BpeTrain.encodeExpr(col("w"), merges).as("toks"))
      .head.getSeq[String](0)
    assert(got == Seq("low", "est"))
  }

  test("train stops early when no pairs remain") {
    val tiny = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val got = BpeTrain.train(tiny, numMerges = 5)
    assert(got.map(m => (m.left, m.right)) == Seq(("a", "b")))
  }

  test("tokenCounts: per-doc counts under the classic table, hand-checked") {
    val merges = BpeTrain.train(corpus, numMerges = 8)
    // after 8 merges: low→[low], lower→[low,e,r], newest→[newest],
    // widest→[w,i,dest]
    val docs = Seq(
      (0L, "low lower"),     // 1 + 3 = 4 bpe tokens, 2 words
      (1L, "newest widest"), // 1 + 3 = 4, 2 words
      (2L, "lowest"))        // low,est = 2, 1 word
      .toDF("doc_id", "text")
    val got = BpeTrain.tokenCounts(docs, merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 2L, 4L), (1L, 2L, 4L), (2L, 1L, 2L)))
  }

  test("trainDF on real documents returns ranked rows") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = BpeTrain.trainDF(docs.limit(50), numMerges = 3).collect()
    assert(got.length == 3)
    assert(got.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    assert(got.forall(_.getAs[Long]("pair_count") > 0))
  }
}
