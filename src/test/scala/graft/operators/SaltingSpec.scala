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
}
