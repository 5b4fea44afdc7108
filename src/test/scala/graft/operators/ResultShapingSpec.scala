package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Grouped (Milvus group_by) search and facet counts: degeneracy to the
  * plain top-k, cap enforcement, and histogram consistency. */
class ResultShapingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("groupedTopK with a non-binding cap equals the plain exact top-k") {
    val grouped = ResultShaping.selfSearchGrouped(emb,
      numQueries = 4, k = 10, perGroup = 10)
      .select($"query_id", $"rank", $"vec_id")
    val plain = KnnSearch.selfTopK(emb, numQueries = 4, k = 10)
      .select($"query_id", $"rank", $"vec_id")
    assert(grouped.exceptAll(plain).isEmpty && plain.exceptAll(grouped).isEmpty)
  }

  test("group cap is enforced and ranks are dense") {
    val r = ResultShaping.selfSearchGrouped(emb,
      numQueries = 8, k = 10, perGroup = 2).cache()
    assert(r.groupBy($"query_id", $"group").count().where($"count" > 2)
      .count() === 0)
    val bad = r.groupBy($"query_id")
      .agg(count(lit(1)).as("n"), max($"rank").as("mx"), min($"rank").as("mn"))
      .where($"mx" =!= $"n" || $"mn" =!= 1).count()
    assert(bad === 0)
    // survivors rank in the same distance order as the uncapped list
    val monotoneViolations = r.as[(Long, Long, Long, Long, Double)]
      .collect().groupBy(_._1).values.count { rows =>
        val dists = rows.sortBy(_._2).map(_._5).toSeq
        dists != dists.sorted
      }
    assert(monotoneViolations === 0)
    r.unpersist()
  }

  test("page 2 by cursor equals ranks 11..20 of the full ranking") {
    val page2 = ResultShaping.selfSearchPage2(emb, numQueries = 6, k = 10)
      .select($"query_id", $"rank", $"vec_id")
    val full = KnnSearch.selfTopK(emb, numQueries = 6, k = 20)
      .where($"rank" > 10)
      .select($"query_id", ($"rank" - 10).as("rank"), $"vec_id")
    assert(page2.exceptAll(full).isEmpty && full.exceptAll(page2).isEmpty)
  }

  test("facet counts sum to k per query and best_rank pins the top hit's group") {
    val k = 20
    val f = ResultShaping.selfFacetCounts(emb, numQueries = 8, k = k).cache()
    val sums = f.groupBy($"query_id").agg(sum($"n_hits").as("s"))
      .where($"s" =!= k).count()
    assert(sums === 0)
    // exactly one group per query carries best_rank = 1
    val top = f.where($"best_rank" === 1)
      .groupBy($"query_id").count().where($"count" =!= 1).count()
    assert(top === 0)
    f.unpersist()
  }
}
