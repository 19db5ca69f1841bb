package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: break down the hamming pair-store first-touch cost —
  * degen census vs inline pair build vs artifact write. */
object ProfilePairStore {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pps] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // JIT warmup on the tiny corpus
    graft.operators.Dedup.simhashPairsInline(spark, "/root/testdata/sf0.001").count()
    t("degen census (sim)") {
      graft.operators.AnnModels.hammingDegen(spark, dir, "sim")(
        graft.operators.Dedup.degenCensusOf(
          graft.sources.Tables.load(spark, dir, "documents")
            .select(col("doc_id"),
              graft.functions.ShingleExpressions.simhash64(col("text")).as("h"))))
    }
    val inline = t("inline pairs count") {
      graft.operators.Dedup.simhashPairsInline(spark, dir).count()
    }
    println(s"[pps] inline rows = $inline")
    t("inline pairs write") {
      graft.operators.Dedup.simhashPairsInline(spark, dir)
        .write.mode("overwrite").parquet("/tmp/pps_pairs.parquet")
    }
    t("store first touch") {
      graft.operators.Dedup.simhashPairs(spark, dir).count()
    }
    t("store served") {
      graft.operators.Dedup.simhashPairs(spark, dir).count()
    }
    spark.stop()
  }
}
