package graft.tools

import graft.GraftSession
import graft.operators._

/** Dev tool: print executed plans for scale-critical queries so scan
  * pruning / pushdown / join strategy / codegen spans can be audited.
  * `runMain graft.tools.PlanAudit [sfDir]`. PlansSpec asserts the
  * load-bearing properties; this main is for eyeballs. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val s = GraftSession.local(4)
    val targets = Seq(
      "q_pricing_summary" -> Analytics.pricingSummary(s, sf),
      "mr_join_mapside" -> MapReduce.joinMapSide(s, sf),
      "q_shipping_priority" -> Analytics.shippingPriority(s, sf),
      "q_forecast_revenue" -> Analytics.forecastRevenue(s, sf),
      "q_asof_join" -> Analytics.asofJoin(s, sf),
      "mr_topk" -> MapReduce.topK(s, sf),
      "mr_topk_per_key" -> MapReduce.topKPerKey(s, sf),
      "text_langid" -> TextOps.langid(s, sf),
      "dedup_embedding" -> Dedup.embeddingNearDup(s, sf),
      "dedup_minhash_lsh" -> Dedup.minhashLsh(s, sf),
      "sim_ann_ivf" -> Similarity.annIvf(s, sf),
      "sim_ann_ivfpq_rerank" -> Similarity.annIvfPqRerank(s, sf),
      "text_perplexity_bucket" -> TextOps.perplexityBucket(s, sf),
      "text_entropy" -> TextOps.entropy(s, sf),
      "pipeline_mix_temperature" -> Pipeline.mixTemperature(s, sf),
      "pipeline_mix_manifest" -> Pipeline.mixManifest(s, sf),
      "pipeline_decontaminate" -> Pipeline.decontaminate(s, sf))
    targets.foreach { case (name, df) =>
      println(s"\n========== $name")
      println(df.queryExecution.executedPlan.toString)
    }
    s.stop()
  }
}
