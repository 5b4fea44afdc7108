package graft.operators

import graft.SparkSpec

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse sums reciprocal ranks and treats missing docs as 0") {
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc_id", "rank")
    val b = Seq((11L, 1L), (13L, 2L)).toDF("doc_id", "rank")
    val got = HybridSearch.rrfFuse(a, b, kConst = 60, topN = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(11L) == 1.0 / 62 + 1.0 / 61) // in both lists
    assert(got(10L) == 1.0 / 61)            // only in a
    assert(got(13L) == 1.0 / 62)            // only in b
    // doc in both lists outranks any single-list doc here
    assert(got(11L) > got(10L) && got(11L) > got(13L))
  }

  test("topN truncates after fusion") {
    val a = (1L to 20L).map(i => (i, i)).toDF("doc_id", "rank")
    val b = (1L to 20L).map(i => (i + 100, i)).toDF("doc_id", "rank")
    assert(HybridSearch.rrfFuse(a, b, 60, 7).count() == 7)
  }

  test("rankBounded equals the global row_number window, with no WindowExec") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // ties in score broken by doc_id, like a real top-N list
    val list = Seq((5L, 0.9), (3L, 0.9), (8L, 1.4), (1L, 0.2), (7L, 0.9))
      .toDF("doc_id", "score").localCheckpoint(true)
    val viaWindow = list.withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select("doc_id", "rank")
    val viaCount = HybridSearch.rankBounded(list, "doc_id", "score")
    assert(viaCount.orderBy("doc_id").collect().toSeq ==
      viaWindow.orderBy("doc_id").collect().toSeq)
    val plan = viaCount.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rankBounded must not plan a window:\n$plan")
  }
}
