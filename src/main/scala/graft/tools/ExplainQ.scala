package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the executed plan of named queries at a target SF. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.count() // let AQE finalize
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString.take(9000))
    }
    spark.stop()
  }
}
