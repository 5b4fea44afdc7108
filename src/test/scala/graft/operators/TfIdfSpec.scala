package graft.operators

import graft.SparkSpec

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("topTerms scores tf·idf with smoothed idf and ranks per doc") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry date")
    ).toDF("doc_id", "text")
    val got = TfIdf.topTerms(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    def idf(df: Long) = math.log((3 + 1.0) / (df + 1.0)) + 1.0
    // doc 1: apple tf=2 df=1 beats banana tf=1 df=2
    assert(got((1L, 1L)) == ("apple", 2L, 1L, 2 * idf(1)))
    assert(got((1L, 2L)) == ("banana", 1L, 2L, 1 * idf(2)))
    // doc 3: cherry tf=3 df=2 beats date tf=1 df=1
    assert(got((3L, 1L)) == ("cherry", 3L, 2L, 3 * idf(2)))
    assert(got((3L, 2L)) == ("date", 1L, 1L, 1 * idf(1)))
    // doc 2: equal scores (both tf=1 df=2) → term-asc tiebreak
    assert(got((2L, 1L))._1 == "banana" && got((2L, 2L))._1 == "cherry")
  }

  test("k caps output per doc") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    assert(TfIdf.topTerms(docs, k = 3).count() == 3)
  }
}
