package graft

import org.apache.spark.sql.functions._

import graft.operators.{FilteredSearchPlanner, KnnSearch}

/** The cardinality rule: selective predicates go brute (exact by
  * construction), permissive ones go to the graph walk — and at beam ≥
  * shard size the graph branch is exact too, so both branches must
  * agree with the brute-force filtered answer. */
class FilteredSearchPlannerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  private def bruteFiltered(pred: org.apache.spark.sql.Column): Seq[Seq[Any]] = {
    val q = emb.where($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    KnnSearch.topK(q, emb.where(pred).select($"vec_id", $"embedding".as("vec")),
        k = 10, excludeSelf = true)
      .select($"query_id", $"rank", $"vec_id")
      .orderBy($"query_id", $"rank").collect().map(_.toSeq).toSeq
  }

  test("the cardinality rule picks the expected branch") {
    assert(FilteredSearchPlanner.chooseBruteForce(emb, $"label" < 4, 0.5),
      "40% selectivity must go brute")
    assert(!FilteredSearchPlanner.chooseBruteForce(emb, $"label" < 8, 0.5),
      "80% selectivity must go to the graph walk")
  }

  test("selective predicate: planned result equals the exact filtered answer") {
    val got = FilteredSearchPlanner.search(emb, $"label" < 4, numQueries = 8, k = 10)
      .select($"query_id", $"rank", $"vec_id").collect().map(_.toSeq).toSeq
    assert(got == bruteFiltered($"label" < 4))
  }

  test("permissive predicate: the graph branch at beam >= shard size is exact too") {
    val got = FilteredSearchPlanner.search(emb, $"label" < 8, numQueries = 8, k = 10,
        numPartitions = 4, searchBeam = 512)
      .select($"query_id", $"rank", $"vec_id").collect().map(_.toSeq).toSeq
    assert(got == bruteFiltered($"label" < 8))
  }

  test("estimateDupMultiplicity edges: unique corpus ~ 1, exact replicas = m, empty = 1") {
    // unique directions at realistic dimension (64): random angles
    // concentrate near π/2, every (band, bucket) is a near-singleton,
    // and the estimate self-calibrates low — the meta-defaulted k·m
    // floor stays inert on ordinary corpora. (At toy dimensions the
    // angular spread is real and the estimator honestly reads it as
    // mild tie concentration — 16-d random measured ~2.7.)
    val unique = (1L to 200L).map { i =>
      val rr = new scala.util.Random(i)
      (i, Array.fill(64)(rr.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
    val mU = FilteredSearchPlanner.estimateDupMultiplicity(unique)
    assert(mU >= 1.0 && mU < 2.0, s"unique corpus estimated $mU")
    // EXACT duplicates (no jitter): both widths see identical
    // co-occupancy, the slope guard fires, and the measured width-b1
    // value IS the multiplicity — exactly m with no extrapolation
    val repl = (1L to 200L).map { i =>
      val base = (i - 1) / 8 + 1 // 25 distinct vectors x 8 exact copies
      val rr = new scala.util.Random(base)
      (i, Array.fill(64)(rr.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
    val mR = FilteredSearchPlanner.estimateDupMultiplicity(repl)
    // never undershoots on exact copies (identical buckets at both
    // widths make the width-b1 measurement itself ≥ m); the modest
    // overshoot is cross-direction collisions at the narrow width —
    // n = 200 gives only 10-bit buckets, so 25 directions still touch
    assert(mR >= 7.5 && mR <= 12.0, s"8-way exact replicas estimated $mR")
    val empty = unique.where($"vec_id" < 0)
    assert(FilteredSearchPlanner.estimateDupMultiplicity(empty) == 1.0)
  }
}
