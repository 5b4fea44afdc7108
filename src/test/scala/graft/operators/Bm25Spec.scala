package graft.operators

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  test("rank matches a hand-computed Okapi BM25 score") {
    val docs = Seq(
      (1L, "join join hash x y"),  // len 5
      (2L, "join scan z"),         // len 3
      (3L, "a b c d")              // len 4, no query terms
    ).toDF("doc_id", "text")
    val got = Bm25.rank(docs, Seq("join", "hash"), topN = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = 3.0; val avgdl = 12.0 / 3
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def ts(tf: Double, df: Double, len: Double) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / avgdl))
    val d1 = ts(2, 2, 5) + ts(1, 1, 5) // join(tf2,df2) + hash(tf1,df1), term-asc fold: hash first
    val d1Sorted = ts(1, 1, 5) + ts(2, 2, 5)
    assert(got(1L) == d1Sorted || got(1L) == d1) // associativity: equal here unless bits differ
    assert(math.abs(got(1L) - d1Sorted) < 1e-12)
    assert(math.abs(got(2L) - ts(1, 2, 3)) < 1e-12)
    assert(!got.contains(3L)) // no query terms → no score row
    // doc with more matches outranks
    assert(got(1L) > got(2L))
  }

  test("rankBatch: one plan over a query-terms table equals per-query rank calls") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val queries = Seq(
      0L -> Seq("join", "hash", "filter", "scan"),
      1L -> Seq("merge", "vector"),
      2L -> Seq("zzz_not_in_vocab", "batch"))
    val qt = queries.flatMap { case (q, ts) => ts.map(q -> _) }
      .toDF("query_id", "term")
    val got = Bm25.rankBatch(docs, qt, topN = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    queries.foreach { case (qid, terms) =>
      val single = Bm25.rank(docs, terms, topN = 8).collect()
        .zipWithIndex
        .map { case (r, i) => (qid, i + 1L, r.getLong(0), r.getDouble(1)) }
      assert(got.getOrElse(qid, Array.empty).toSeq.sortBy(_._2) == single.toSeq,
        s"query $qid diverges from the single-query ranking")
    }
  }

  test("rankBatchFromIndex on the impact index is bit-identical to rankBatch on the corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val qt = Seq(0L -> "join", 0L -> "merge", 1L -> "vector", 1L -> "scan")
      .toDF("query_id", "term")
    val idx = SparseTopK.buildImpactIndex(docs)
    val fromIdx = Bm25.rankBatchFromIndex(idx, qt, topN = 10).collect().map(_.toSeq).toSeq
    val direct = Bm25.rankBatch(docs, qt, topN = 10).collect().map(_.toSeq).toSeq
    assert(fromIdx == direct)
  }

  test("topN truncates globally by (score desc, doc_id)") {
    val docs = (1L to 30L).map(i => (i, if (i <= 5) "join join" else "join x"))
      .toDF("doc_id", "text")
    val top = Bm25.rank(docs, Seq("join"), topN = 5)
      .collect().map(_.getLong(0)).toSet
    assert(top == Set(1L, 2L, 3L, 4L, 5L)) // the tf=2 docs win
  }
}
