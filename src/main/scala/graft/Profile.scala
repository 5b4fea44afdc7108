package graft
import org.apache.spark.sql.SparkSession

/** Local profiling harness: run one registry query N times in a single
  * JVM to split plan/codegen-compile cost (run 1) from steady-state
  * execution (runs 2+). Not part of the driver contract.
  *
  *   sbt "runMain graft.Profile q_text_quality /root/testdata/sf0.1 3"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"RUN$i: ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
