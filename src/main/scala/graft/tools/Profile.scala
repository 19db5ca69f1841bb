package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.functions._
import graft.sources.Tables

/** Scratch profiler for stage-level timing of the dedup hot path. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local(32)
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    val docs = Tables.load(s, sf, "documents").repartition(col("doc_id"))
    // warm
    docs.count()

    time("scan+tokens")(docs.select(wsTokens(col("text")).as("t")).select(sum(size(col("t")))).collect().head.getLong(0))
    time("shingles")(docs.select(wordShingles(wsTokens(col("text")), 3).as("sh")).select(sum(size(col("sh")))).collect().head.getLong(0))
    // the ACTUAL pipeline expression (derived-hash family), not the legacy
    // HOF helper — profiling the wrong hash family tells you nothing
    val sig = docs
      .select(col("doc_id"),
        posexplode(ShingleExpressions.minhashSig(col("text"), 8, 3)).as(Seq("band", "h")))
    time("minhash signatures")(sig.count())
    val buckets = sig.groupBy("band", "h").agg(sort_array(collect_list(col("doc_id"))).as("ids")).filter(size(col("ids")) > 1)
    time("buckets")(buckets.count())
    time("full minhashLsh")(graft.operators.Dedup.minhashLsh(s, sf).count())
    time("full ngramJaccard")(graft.operators.Dedup.ngramJaccard(s, sf).count())
    time("ngram expand only") {
      val sh = docs.select(col("doc_id"), array_distinct(wordShingles(wsTokens(col("text")), 3)).as("sh"))
        .filter(size(col("sh")) > 0)
        .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("g"))
      sh.count()
    }
    s.stop()
  }
}
