package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only per-query timer (the Bench protocol on a named subset):
  * warmup at sf0.001, then three timed passes at the target SF. */
object TimeQ {
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
    val qs = args.drop(1)
    // warmup at the smallest local SF when present, else the target dir
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", {
      val d = "/root/testdata/sf0.001"
      if (new java.io.File(d).exists()) d else sfDir
    })
    qs.foreach { q =>
      graft.SparkEntry.queries(q)(spark, warmDir).count()
    }
    qs.foreach { q =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeq] $q%-26s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
