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
}
