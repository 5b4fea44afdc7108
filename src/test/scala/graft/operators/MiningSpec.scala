package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MiningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("hardNegatives returns k rows per query, all with a different label") {
    val r = Mining.hardNegatives(emb, numQueries = 4, k = 5).cache()
    val labels = emb.select($"vec_id".as("query_id"), $"label".as("qlabel"))
    assert(r.groupBy($"query_id").count().where($"count" =!= 5).count() == 0)
    val joined = r.join(labels, "query_id")
    assert(joined.where($"neg_label" === $"qlabel".cast("long")).count() == 0)
    r.unpersist()
  }

  test("hardNegatives distances dominate: each negative is at least as far as the previous rank") {
    val r = Mining.hardNegatives(emb, numQueries = 4, k = 8)
      .select($"query_id", $"rank", $"dist").collect()
      .groupBy(_.getLong(0))
    r.values.foreach { rows =>
      val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
    }
  }

  test("knnClassify emits one prediction per query with consistent vote counts") {
    val r = Mining.knnClassify(emb, numQueries = 16, k = 10).cache()
    assert(r.count() == 16)
    assert(r.select($"query_id").distinct().count() == 16)
    // votes are a subset of k
    assert(r.where($"n_votes" < 1 || $"n_votes" > 10).count() == 0)
    // correct flag is consistent with the labels
    assert(r.where($"correct" =!= ($"pred_label" === $"true_label")).count() == 0)
    r.unpersist()
  }

  test("maxSim self-search: self-similar slices rank high and scores are monotone by rank") {
    val r = LateInteraction.selfSearch(emb.where($"vec_id" < 500),
      numQueries = 3, m = 8, subDim = 8, k = 6)
      .select($"query_id", $"rank", $"score").collect()
      .groupBy(_.getLong(0))
    assert(r.size == 3)
    r.values.foreach { rows =>
      val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF-shortlisted maxSim: results come from probed cells and track full maxSim") {
    val corpus = emb.where($"vec_id" < 500)
    val full = LateInteraction.selfSearch(corpus,
      numQueries = 3, m = 8, subDim = 8, k = 6)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val short = LateInteraction.selfSearchShortlisted(corpus,
      numQueries = 3, m = 8, subDim = 8, nlist = 8, nprobe = 8, k = 6)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // nprobe = nlist ⇒ the shortlist IS the corpus ⇒ identical results
    assert(short == full)
    // pruned probes: candidates restricted to probed cells, scores still
    // exact MaxSim — overlap with full top-k gauges the candidate
    // generator, deterministic by seeded construction
    val pruned = LateInteraction.selfSearchShortlisted(corpus,
      numQueries = 3, m = 8, subDim = 8, nlist = 8, nprobe = 2, k = 6)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = (pruned intersect full).size.toDouble / full.size
    info(f"shortlisted (2/8 cells) vs full maxSim overlap = $overlap%.3f")
    assert(overlap >= 0.3, "IVF shortlist must surface a real fraction of the full top-k")
  }

  test("mutualPairs keeps exactly the reciprocal edges, canonicalized a < b") {
    // hand fixture: 1↔2 reciprocal, 3→1 unreciprocated, 4↔5 reciprocal
    val topk = Seq(
      (1L, 2L, 0.5), (2L, 1L, 0.5),
      (3L, 1L, 0.9),
      (5L, 4L, 0.2), (4L, 5L, 0.2)
    ).toDF("query_id", "vec_id", "dist")
    val pairs = Mining.mutualPairs(topk)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (4L, 5L)))
  }

  test("mutualKnn pairs are symmetric members of each other's exact top-k") {
    val n = 64; val k = 5
    val pairs = Mining.mutualKnn(emb, n = n, k = k).cache()
    assert(pairs.count() > 0)
    assert(pairs.where($"a" >= $"b").count() === 0)
    // reciprocity against the exact edge table both directions
    val slice = emb.where($"vec_id" < n)
    val topk = KnnSearch.topK(
      slice.select($"vec_id".as("query_id"), $"embedding".as("qvec")),
      slice.select($"vec_id", $"embedding".as("vec")),
      k = k, excludeSelf = true)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    pairs.select($"a", $"b").as[(Long, Long)].collect().foreach { case (a, b) =>
      assert(topk((a, b)) && topk((b, a)), s"pair ($a,$b) not reciprocal")
    }
    pairs.unpersist()
  }

  test("maxSim degenerates to plain dot product at m = 1") {
    val ms = LateInteraction.selfSearch(emb.where($"vec_id" < 300),
      numQueries = 3, m = 1, subDim = 64, k = 5)
      .select($"query_id", $"rank", $"vec_id", $"score".as("s"))
    val ip = KnnSearch.selfTopKIp(emb.where($"vec_id" < 300), numQueries = 3, k = 5)
      .select($"query_id", $"rank", $"vec_id", $"score".as("s"))
    assert(ms.exceptAll(ip).isEmpty && ip.exceptAll(ms).isEmpty)
  }
}
