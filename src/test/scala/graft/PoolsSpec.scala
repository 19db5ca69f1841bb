package graft

import graft.sources.Tables

/** The FCFS-heritage surface (SURVEY §1/§2E): workload segregation via
  * scheduler pools — FIFO within a pool, weighted across pools, the way the
  * reference's FCFSManager orders block transfers by flow priority. */
class PoolsSpec extends SparkSpec {

  test("withPool tags jobs with the pool and restores the default after") {
    val sc = spark.sparkContext
    val n = GraftSession.withPool(spark, "ingest") {
      assert(sc.getLocalProperty("spark.scheduler.pool") == "ingest")
      Tables.load(spark, sf, "nation").count()
    }
    assert(n == 25)
    assert(sc.getLocalProperty("spark.scheduler.pool") == null)
  }

  test("withPool restores the default even when the body throws") {
    val sc = spark.sparkContext
    intercept[RuntimeException] {
      GraftSession.withPool(spark, "adhoc")(throw new RuntimeException("boom"))
    }
    assert(sc.getLocalProperty("spark.scheduler.pool") == null)
  }
}
