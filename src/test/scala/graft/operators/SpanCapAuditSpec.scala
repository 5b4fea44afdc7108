package graft.operators

import graft.SparkSpec

/** Executable proof for the duplicateSpans boilerplate cap (VERDICT r5
  * item 6): measure the candidate-pair volume the gram self-join would
  * materialize, capped vs uncapped, at bench scale (sf0.1) — the
  * numbers SCALE.md records. The stats come off one grouped aggregate
  * of the posting table (no join run), so the uncapped number is
  * measurable even where the uncapped join would be the F² pathology. */
class SpanCapAuditSpec extends SparkSpec {

  test("maxGramDocFreq cap shrinks the span-join candidate volume at bench scale") {
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def stats(cap: Int): (Long, Long, Long) = {
      val r = Dedup.spanCandidateStats(docs, minTokens = 5, maxGramDocFreq = cap).head()
      (r.getLong(0), r.getLong(1), r.getDecimal(2).longValueExact())
    }
    val (uPost, uGrams, uPairs) = stats(0)
    val (cPost, cGrams, cPairs) = stats(2)
    info(s"sf0.1 uncapped: postings=$uPost grams=$uGrams candidate_pairs=$uPairs")
    info(s"sf0.1 cap=2:    postings=$cPost grams=$cGrams candidate_pairs=$cPairs")
    info(f"pair reduction: ${100.0 * (uPairs - cPairs) / uPairs}%.1f%%")
    assert(cPairs < uPairs, "cap must strictly reduce candidate pairs on this corpus")
    assert(cPost < uPost)
    // the capped join's exact OUTPUT is oracle-pinned by q_dup_spans_capped;
    // this spec pins the capped join's exact INPUT volume
  }

  test("candidate-pair arithmetic matches a brute-force count on a small fixture") {
    import spark.implicits._
    // gram "a b c d e" appears twice in doc 1 and once in docs 2 and 3:
    // pairs with doc_a<doc_b = c1*c2 + c1*c3 + c2*c3 = 2+2+1 = 5
    val docs = Seq(
      (1L, "a b c d e x a b c d e"),
      (2L, "a b c d e"),
      (3L, "z a b c d e")).toDF("doc_id", "text")
    val r = Dedup.spanCandidateStats(docs, minTokens = 5).head()
    // postings: doc1 has 7 5-grams (2 of them "a b c d e"), doc2 1, doc3 2
    assert(r.getLong(0) == 10L, s"postings=${r.getLong(0)}")
    assert(r.getDecimal(2).longValueExact() == 5L, s"pairs=${r.getDecimal(2)}")
  }
}
