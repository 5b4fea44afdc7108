package graft.queries

import graft.SparkSpec

/** Registry-wide physical-plan audit: no query may plan an unbroadcast
  * cartesian product. A CartesianProductExec shuffles |A|×|B| rows — at
  * 100 TB any accidental one is a cluster-killer; every intentional
  * all-pairs shape in the library rides a broadcast (BroadcastNestedLoop)
  * with a small side bounded by construction, and every equi-join either
  * broadcasts or hash-partitions. */
class PlanAuditSpec extends SparkSpec {

  test("no registry query plans CartesianProduct") {
    val offenders = Registry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val p = fn(spark, sf0001).queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct")) Some(name) else None
      } catch { case _: Throwable => None } // run failures are RegistrySmokeSpec's job
    }
    assert(offenders.isEmpty, s"queries planning a cartesian product: $offenders")
  }
}
