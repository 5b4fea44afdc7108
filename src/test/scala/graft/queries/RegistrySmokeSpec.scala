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

  test("every registry query output schema is flat (driver compare cannot hash arrays)") {
    // The driver's DuckDB/pandas compare sorts the dumped parquet by every
    // column; an array/map/struct cell is unhashable there and crashes the
    // round's correctness row (the r2 q_pca_reduce/q_whiten failure class).
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = Registry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val complex = fn(spark, sf0001).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] => f.name
        }
        if (complex.isEmpty) None else Some(s"$name: ${complex.mkString(",")}")
      } catch { case _: Throwable => None } // run failures are the next test's job
    }
    assert(offenders.isEmpty, s"complex-typed output columns: $offenders")
  }

  test("q_ivf_pruned_knn equals q_ivf_knn row-for-row (pruning changes reads, not results)") {
    val mem = Registry.queries("q_ivf_knn")(spark, sf0001).collect().map(_.toString)
    val pruned = Registry.queries("q_ivf_pruned_knn")(spark, sf0001).collect().map(_.toString)
    assert(pruned.toSeq == mem.toSeq)
  }

  test("q_ivfpq_pruned_knn equals q_ivfpq_knn row-for-row") {
    val mem = Registry.queries("q_ivfpq_knn")(spark, sf0001).collect().map(_.toString)
    val pruned = Registry.queries("q_ivfpq_pruned_knn")(spark, sf0001).collect().map(_.toString)
    assert(pruned.toSeq == mem.toSeq)
  }

  test("q_ivf_hnsw_knn equals q_ivf_knn row-for-row (ef >= nlist makes probes exact)") {
    val mem = Registry.queries("q_ivf_knn")(spark, sf0001).collect().map(_.toString)
    val hnsw = Registry.queries("q_ivf_hnsw_knn")(spark, sf0001).collect().map(_.toString)
    assert(hnsw.toSeq == mem.toSeq)
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
