package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for a list of registry queries
  * (PLANS.md source material). Test scope — not part of the library.
  * Usage: sbt "Test/runMain graft.PlanDump q_flat_knn q_ivf_pruned_knn ..." */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { name =>
      println(s"===== $name =====")
      val df = graft.queries.Registry.queries(name)(spark, dir)
      // queryExecution.explainString mirrors df.explain("formatted")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
