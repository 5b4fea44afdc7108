package graft.queries

import graft.SparkSpec

/** Registry-wide smoke: every declared query runs at sf0.001 and returns
  * rows, and every oracle key has a matching query (the driver's t1/t2
  * contract preconditions). */
class RegistrySmokeSpec extends SparkSpec {

  test("every oracle key has a query; no orphans") {
    val orphans = Registry.oracleSql.keySet -- Registry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("every registry query runs at sf0.001 and returns rows") {
    val failures = Registry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, sf0001).count()
        if (n > 0) None else Some(s"$name: 0 rows")
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
