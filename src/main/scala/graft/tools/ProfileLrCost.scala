package graft.tools

import graft.GraftSession

/** Scratch profiler for the LR-margin serving cost: warms the corpus LM,
  * then times AnnModels.lrMargins first-touch vs served, reporting which
  * registry artifacts trained inside (the train-counter delta) — the
  * breakdown behind the "distributed LR fit" scale question. */
object ProfileLrCost {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = GraftSession.local(16)
    val T = graft.operators.TextOps
    val A = graft.operators.AnnModels

    def snap = Seq(
      "lm" -> A.lmTrains, "ppl" -> A.pplScoreTrains,
      "lrm" -> A.lrMarginTrains, "qual" -> A.qualityTrains,
      "tm" -> A.trainedMarginTrains, "ql" -> A.qualityLogitTrains,
      "tok" -> A.tokenTotalTrains, "dsir" -> A.dsirTrains,
      "lm5" -> A.lm5Trains, "p5" -> A.ppl5ScoreTrains,
      "lid" -> A.langidTrains, "ig" -> A.ingestGateTrains,
      "lrg" -> A.lrGateTrains)
    def timed[T](label: String)(f: => T): T = {
      val b = snap
      val t = System.nanoTime
      val r = f
      val el = (System.nanoTime - t) / 1e9
      val delta = snap.zip(b).collect { case ((k, x), (_, y)) if x != y => s"$k:$y->$x" }
      println(f"[lrcost] $label%-22s $el%8.2f s  trained={${delta.mkString(",")}}")
      r
    }

    timed("ppl warm")(T.perplexity(s, sf).count())
    val d = graft.sources.Tables.load(s, sf, "documents")
    val feats = timed("feats checkpoint")(
      T.qualityFeaturesOf(d, T.perplexity(s, sf)).localCheckpoint())
    val labels = T.gopherSeedOf(d)
    val (lmu, lw) = timed("fit loop (serving)")(T.qualityLrFit(feats, labels))
    val (pmu, pw) = timed("fit plan (alt)")(T.qualityLrFitPlan(feats, labels))
    println(s"[lrcost] identical=${lmu.sameElements(pmu) && lw.sameElements(pw)}")
    timed("lrMargins first")(A.lrMargins(s, sf).count())
    timed("lrMargins served")(A.lrMargins(s, sf).count())
    s.stop()
  }
}
