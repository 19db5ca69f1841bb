package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the logistic quality fit: fitted weights, keep
  * split, and agreement with the seed labels. */
object ProfileLr {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = GraftSession.local(16)
    val T = graft.operators.TextOps
    val d = graft.sources.Tables.load(s, sf, "documents")
    val feats = T.qualityFeaturesOf(d, T.perplexity(s, sf)).localCheckpoint()
    val labels = T.gopherSeedOf(d)
    val (mu, w) = T.qualityLrFit(feats, labels)
    println(s"[lr] mu=${mu.mkString(",")}")
    println(s"[lr] w =${w.mkString(",")}")
    val scored = T.qualityLrScoreWith(feats, mu, w).join(labels, Seq("doc_id"))
    scored.groupBy("lr_keep", "cls").count().orderBy("lr_keep", "cls").show()
    val acc = scored.select(avg(when(col("lr_keep") === col("cls"), 1.0).otherwise(0.0)))
      .collect().head.getDouble(0)
    println(f"[lr] full-corpus seed agreement = $acc%.3f")

    // Synthetic non-separable-by-midpoint corpus: cls1 tight at punct
    // 9900; cls0 = 100 docs at 8700 + 20 far-low outliers at 500. The
    // outliers drag the cls0 centroid low enough that the Rocchio
    // midpoint lands INSIDE the 8700-cluster, which it then keeps.
    import s.implicits._
    val rows = (0 until 80).map(i => (i.toLong * 2, 1, 9900L)) ++
      (0 until 100).map(i => (200L + i * 2, 0, 8700L)) ++
      (0 until 20).map(i => (500L + i * 2, 0, 500L))
    val sfeats = rows.toDF("doc_id", "cls", "f_punct")
      .select(col("doc_id"), col("cls"), lit(5000L).as("f_stop"),
        lit(5000L).as("f_rep"), col("f_punct"), lit(5000L).as("f_rep3"),
        lit(5000L).as("f_nll"), lit(5000L).as("f_len"))
    val slabels = sfeats.select("doc_id", "cls")
    val sf6 = sfeats.drop("cls")
    // Rocchio accuracy on the same matrix
    val cent = sfeats.filter(col("doc_id") % 2 === 0).groupBy("cls")
      .agg(count(lit(1)).as("n"),
        T.QualityFeatNames.map(f => sum(col(f)).as(s"s$f")): _*)
      .select(col("cls") +: col("n") +:
        T.QualityFeatNames.map(f =>
          expr(s"s$f DIV n").as(f.replaceFirst("f_", "w_"))): _*)
    val roc = T.qualityTrainedWith(sf6, cent.collect()).join(slabels, Seq("doc_id"))
      .select(avg(when(col("trained_keep") === col("cls"), 1.0).otherwise(0.0)))
      .collect().head.getDouble(0)
    println(f"[lr] synthetic rocchio acc = $roc%.3f")
    for ((k, en, ed) <- Seq((8, 1L, 2L), (16, 8L, 1L), (24, 8L, 1L), (32, 8L, 1L), (48, 8L, 1L), (16, 4L, 1L), (32, 4L, 1L))) {
      val (smu, sw) = T.qualityLrFit(sf6, slabels, k, en, ed)
      val sacc = T.qualityLrScoreWith(sf6, smu, sw).join(slabels, Seq("doc_id"))
        .select(avg(when(col("lr_keep") === col("cls"), 1.0).otherwise(0.0)))
        .collect().head.getDouble(0)
      println(f"[lr] synthetic k=$k eta=$en/$ed acc = $sacc%.3f  w=${sw.mkString(",")}")
    }
    s.stop()
  }
}
