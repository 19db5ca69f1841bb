package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.Tables

/** Scratch: sub-stage timings behind the round-16 heavy tail
  * (build family, dedup minhash family, equidepth, sketches). */
object ProfileR16 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local(32)
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[p16] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    // warm the scan + artifacts once
    graft.operators.Pipeline.build(s, sf).count()
    graft.operators.Dedup.minhashLsh(s, sf).count()

    time("gopherRules")(graft.operators.TextOps.gopherRules(s, sf).count())
    time("qualityCalibrated")(graft.operators.TextOps.qualityCalibrated(s, sf).count())
    time("decontaminate")(graft.operators.Pipeline.decontaminate(s, sf).count())
    time("survivors(artifact)")(graft.operators.Dedup.survivors(s, sf).count())
    time("docs ntok scan")(Tables.load(s, sf, "documents")
      .select(col("source"), col("doc_id")).count())
    time("buildBaseCalibrated")(graft.operators.Pipeline.buildBaseCalibrated(s, sf).count())
    time("build (full)")(graft.operators.Pipeline.build(s, sf).count())
    time("buildCalibrated (full)")(graft.operators.Pipeline.buildCalibrated(s, sf).count())
    time("mixTemperature")(graft.operators.Pipeline.mixTemperature(s, sf).count())
    time("buildOrdered (full)")(graft.operators.Pipeline.buildOrdered(s, sf).count())

    time("minhashLsh pairs")(graft.operators.Dedup.minhashLsh(s, sf).count())
    time("dedup_clusters (full)")(graft.operators.Dedup.clusterAssign(s, sf).count())
    time("weightedJaccard (full)")(graft.operators.Dedup.weightedJaccard(s, sf).count())
    time("minhashEstimate (full)")(graft.operators.Dedup.minhashEstimate(s, sf).count())
    time("boilerplateTopK (full)")(graft.operators.Dedup.boilerplateTopK(s, sf).count())
    s.stop()
  }
}
