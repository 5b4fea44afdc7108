package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ev = readEvents(sf0001)

  test("saltedCountSum equals the plain aggregation") {
    val plain = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.rint(r.getDouble(2) * 100) / 100)).toSet
    val salted = Salting.saltedCountSum(ev, "event_type", "value", 8)
      .collect().map(r => (r.getString(0), r.getLong(1),
        math.rint(r.getDouble(2) * 100) / 100)).toSet
    assert(salted == plain)
  }

  test("saltedJoin row multiset equals the plain join") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet").limit(2000)
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderstatus")
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy($"o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedJoin(li, o, "l_orderkey", 4)
      .groupBy($"o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  // SCALE.md's claim for Zipf IVF cells: a hot cluster_id must not pin one
  // reducer. This builds a genuinely skewed assignment — 90% of vectors in
  // cluster 0 — and proves (a) the salted join's result multiset is the
  // plain join's, and (b) the plan really expands the small side per salt
  // (Generate/explode) and shuffles on (cluster_id, _salt), so the hot
  // cell's rows spread over numSalts reducers instead of one.
  test("90%-one-cell skew: salted cluster_id join equals plain, plan shows salt expansion") {
    val n = 2000
    val rows = (0 until n).map { i =>
      val cluster = if (i % 10 == 0) (i / 10) % 7 + 1L else 0L
      (i.toLong, cluster, i * 0.5)
    }
    val big = rows.toDF("vec_id", "cluster_id", "score")
    val small = (0L to 7L).map(c => (c, s"cent_$c")).toDF("cluster_id", "label")
    // disable auto-broadcast so the test exercises the shuffle-join shape
    // salting exists for (a broadcast small side needs no salt at all)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = big.join(small, Seq("cluster_id"))
        .select($"vec_id", $"label").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted
      val saltedDf = Salting.saltedJoin(big, small, "cluster_id", 8)
      val salted = saltedDf.select($"vec_id", $"label").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted
      assert(salted.sameElements(plain))
      assert(salted.count(_._2 == "cent_0") == n - n / 10)
      val plan = saltedDf.queryExecution.executedPlan.toString
      assert(plan.contains("Generate") || plan.contains("explode"),
        "small side must replicate per salt value")
      assert(plan.contains("_salt"),
        "join must key on (cluster_id, _salt) — the skew-spreading key")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
