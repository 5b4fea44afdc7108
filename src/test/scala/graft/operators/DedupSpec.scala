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
}
