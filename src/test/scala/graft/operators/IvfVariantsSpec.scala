package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Filtered (FAISS IDSelector / Milvus bitset) and SPANN-closure
  * multi-assignment IVF variants: degeneracy pins against the plain
  * seeded path and exactness over survivors when all cells are probed. */
class IvfVariantsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("selfSearchMultiSeeded with r = 1 is row-identical to selfSearchSeeded") {
    val multi = IvfIndex.selfSearchMultiSeeded(emb,
      numQueries = 8, nlist = 16, nprobe = 4, k = 10, r = 1)
    val plain = IvfIndex.selfSearchSeeded(emb,
      numQueries = 8, nlist = 16, nprobe = 4, k = 10)
    assert(multi.exceptAll(plain).isEmpty && plain.exceptAll(multi).isEmpty)
  }

  test("assignMulti r = 2 emits exactly two distinct cells per vector, including the argmin cell") {
    val cents = IvfIndex.seedCentroids(emb, 16)
    val multi = IvfIndex.assignMulti(emb, cents, r = 2).cache()
    val n = emb.count()
    assert(multi.count() === 2 * n)
    assert(multi.select($"vec_id", $"cluster_id").distinct().count() === 2 * n)
    // closure assignment is a superset of the argmin assignment
    val argmin = IvfIndex.assign(emb, cents).select($"vec_id", $"cluster_id")
    assert(argmin.exceptAll(multi.select($"vec_id", $"cluster_id")).isEmpty)
    multi.unpersist()
  }

  test("multi-assignment at nprobe < nlist recalls at least as much of the exact top-k as single assignment") {
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet
    val exact = hits(KnnSearch.selfTopK(emb, numQueries = 8, k = 10))
    val single = hits(IvfIndex.selfSearchSeeded(emb,
      numQueries = 8, nlist = 16, nprobe = 2, k = 10)) intersect exact
    val multi = hits(IvfIndex.selfSearchMultiSeeded(emb,
      numQueries = 8, nlist = 16, nprobe = 2, k = 10, r = 2)) intersect exact
    info(s"recall@10: single=${single.size / 80.0} multi(r=2)=${multi.size / 80.0}")
    assert(multi.size >= single.size,
      "closure assignment must not lose recall at equal nprobe")
  }

  test("searchMultiPruned over a persisted closure index equals the in-memory closure search") {
    val dir = java.nio.file.Files.createTempDirectory("spann").toString
    val cents = IvfIndex.seedCentroids(emb, 16)
    IvfIndex.writeIndex(IvfIndex.assignMulti(emb, cents, r = 2), cents, dir)
    val (loaded, assignments) = IvfIndex.loadIndex(spark, dir)
    val q = emb.where($"vec_id" < 8)
      .select($"vec_id".as("query_id"), $"embedding".as("qvec"))
    val pruned = IvfIndex.searchMultiPruned(q, loaded, assignments,
      nprobe = 2, k = 10, excludeSelf = true)
      .select($"query_id", $"rank", $"vec_id")
    val mem = IvfIndex.selfSearchMultiSeeded(emb,
      numQueries = 8, nlist = 16, nprobe = 2, k = 10, r = 2)
      .select($"query_id", $"rank", $"vec_id")
    assert(pruned.exceptAll(mem).isEmpty && mem.exceptAll(pruned).isEmpty)
  }

  test("filtered search returns only predicate survivors with dense ranks") {
    val labels = emb.select($"vec_id", $"label")
    val r = IvfIndex.selfSearchFilteredSeeded(emb, predicate = $"label" < 4,
      numQueries = 8, nlist = 16, nprobe = 4, k = 10).cache()
    assert(r.join(labels, "vec_id").where($"label" >= 4).count() === 0)
    // ranks are 1..count per query (pre-filter never leaves gaps)
    val bad = r.groupBy($"query_id")
      .agg(count(lit(1)).as("n"), max($"rank").as("mx"), min($"rank").as("mn"))
      .where($"mx" =!= $"n" || $"mn" =!= 1).count()
    assert(bad === 0)
    r.unpersist()
  }

  test("filtered search probing every cell equals brute-force top-k over the survivors") {
    val nlist = 16
    val filteredIvf = IvfIndex.selfSearchFilteredSeeded(emb,
      predicate = $"label" < 4, numQueries = 8, nlist = nlist, nprobe = nlist,
      k = 10)
      .select($"query_id", $"rank", $"vec_id")
    val brute = KnnSearch.topK(
      emb.where($"vec_id" < 8)
        .select($"vec_id".as("query_id"), $"embedding".as("qvec")),
      emb.where($"label" < 4).select($"vec_id", $"embedding".as("vec")),
      k = 10, excludeSelf = true)
      .select($"query_id", $"rank", $"vec_id")
    assert(filteredIvf.exceptAll(brute).isEmpty &&
      brute.exceptAll(filteredIvf).isEmpty)
  }

  test("diffIndex of identical versions reports zero adds/removes; totals are consistent") {
    val cents = IvfIndex.seedCentroids(emb, 16)
    val a = IvfIndex.assign(emb, cents)
    val same = IvfIndex.diffIndex(a, a).cache()
    assert(same.where($"n_added" =!= 0 || $"n_removed" =!= 0).count() === 0)
    assert(same.where($"n_old" =!= $"n_new").count() === 0)
    same.unpersist()
    // disjoint slices: everything is an add or a remove, attributed to
    // the surviving side's list; totals reconcile with the inputs
    val v1 = IvfIndex.assign(emb.where($"vec_id" < 200), cents)
    val v2 = IvfIndex.assign(emb.where($"vec_id" >= 200 && $"vec_id" < 450), cents)
    val d = IvfIndex.diffIndex(v1, v2)
      .agg(sum($"n_old"), sum($"n_new"), sum($"n_added"), sum($"n_removed"))
      .head()
    assert(d.getLong(0) === 200L && d.getLong(1) === 250L)
    assert(d.getLong(2) === 250L && d.getLong(3) === 200L)
  }

  test("diffIndex records a moved vector as a remove from its old list AND an add to its new one") {
    // a retrained rebuild moves boundary vectors between lists — the
    // publish audit must see both sides, and per-list n_old/n_new must
    // sum to each version's true populations
    val v1 = Seq((1L, 3L), (2L, 3L)).toDF("vec_id", "cluster_id")
    val v2 = Seq((1L, 5L), (2L, 3L)).toDF("vec_id", "cluster_id")
    val d = IvfIndex.diffIndex(v1, v2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(d(3L) === ((2L, 1L, 0L, 1L)), "old list: vec 1 removed, vec 2 stays")
    assert(d(5L) === ((0L, 1L, 1L, 0L)), "new list: vec 1 added")
  }
}
