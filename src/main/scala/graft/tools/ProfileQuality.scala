package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.sources.Tables

/** Scratch profiler for the quality-model chain (round 10): times the
  * calibrated gate end-to-end and the fused logitBaseCol projection.
  * Findings recorded in qualityModelWith's comment: the fused projection
  * falls out of whole-stage codegen (HOF-heavy) and interpreted eval has
  * no common-subexpression elimination, so the feature-join form wins. */
object ProfileQuality {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local(16)
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    graft.operators.TextOps.qualityModel(s, sf).count() // warm
    time("qualityModel count")(graft.operators.TextOps.qualityModel(s, sf).count())
    time("qualityCalibrated 1")(graft.operators.TextOps.qualityCalibrated(s, sf).count())
    time("qualityCalibrated 2")(graft.operators.TextOps.qualityCalibrated(s, sf).count())
    val docs = Tables.load(s, sf, "documents")
    val base = graft.operators.TextOps.logitBaseCol
    time("fused logitBase checkpoint")(
      docs.select(col("doc_id"), base.as("b")).localCheckpoint().count())
    val cg = docs.select(col("doc_id"), base.as("b"))
      .queryExecution.executedPlan.toString.contains("WholeStageCodegen")
    println("[profile] fused projection in codegen: " + cg)
    s.stop()
  }
}
