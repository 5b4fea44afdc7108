package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrototypePruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  test("keeps exactly ceil(frac * n_c) per cluster; keep_rank is dense from 1") {
    val cents = IvfIndex.seedCentroids(emb, 8)
    val sizes = IvfIndex.assign(emb, cents)
      .groupBy($"cluster_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = EmbeddingQuality.prototypePrune(emb, cents, keepFrac = 0.25)
    val keptSizes = kept.groupBy($"cluster_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sizes.foreach { case (cid, n) =>
      assert(keptSizes.getOrElse(cid, 0L) == math.ceil(0.25 * n).toLong, s"cluster $cid")
    }
    val maxRankOk = kept.groupBy($"cluster_id")
      .agg(max($"keep_rank").as("mx"), count(lit(1)).as("cnt"))
      .where($"mx" =!= $"cnt").count()
    assert(maxRankOk == 0, "keep_rank must be dense 1..kept")
  }

  test("keepHard picks the farthest tail; keepHard=false picks the nearest — disjoint extremes") {
    val cents = IvfIndex.seedCentroids(emb, 8)
    val hard = EmbeddingQuality.prototypePrune(emb, cents, 0.25, keepHard = true)
    val easy = EmbeddingQuality.prototypePrune(emb, cents, 0.25, keepHard = false)
    val minHard = hard.agg(min($"proto_dist")).head.getDouble(0)
    val maxEasy = easy.agg(max($"proto_dist")).head.getDouble(0)
    // the hardest kept quarter must lie strictly above the easiest kept
    // quarter on this fixture (no cluster small enough to overlap)
    info(f"min(hard kept)=$minHard%.2f  max(easy kept)=$maxEasy%.2f")
    val overlap = hard.select($"vec_id")
      .join(easy.select($"vec_id"), Seq("vec_id")).count()
    assert(overlap == 0, "hard-kept and easy-kept quarters must not share vectors")
  }
}
