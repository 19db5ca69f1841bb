package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: where does the unigram encode spend its time? */
object ProfileUni {
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
      println(f"[pu] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.operators.UnigramLm
    // train once so every timed pass serves
    UnigramLm.unigramVocab(spark, dir).count()
    t("vocab read+collect") { UnigramLm.unigramVocab(spark, dir).collect() }
    val costs = UnigramLm.unigramVocab(spark, dir).collect()
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    val d = graft.sources.Tables.load(spark, dir, "documents")
    val toks = split(col("text"), " ", -1)
    t("explode+distinct words") {
      d.select(explode(toks).as("w")).filter(length(col("w")) > 0)
        .distinct().count()
    }
    t("distinct + viterbi DP") {
      d.select(explode(toks).as("w")).filter(length(col("w")) > 0)
        .distinct()
        .select(col("w"), UnigramLm.viterbiSeg(col("w"), costs).as("seg"))
        .collect()
    }
    t("posexplode only") {
      d.select(col("doc_id"), posexplode(filter(toks, w => length(w) > 0)))
        .count()
    }
    t("posexplode+join+groupBy") {
      val segs = d.select(explode(toks).as("w")).filter(length(col("w")) > 0)
        .distinct()
        .select(col("w"), UnigramLm.viterbiSeg(col("w"), costs).as("seg"))
      d.select(col("doc_id"), posexplode(filter(toks, w => length(w) > 0)))
        .withColumnRenamed("col", "w")
        .join(segs, Seq("w"))
        .groupBy("doc_id")
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("seg")))),
          x => x.getField("seg")), " ").as("tids"))
        .count()
    }
    (1 to 2).foreach { i =>
      t(s"full unigramIds pass $i") { UnigramLm.unigramIds(spark, dir).count() }
    }
    spark.stop()
  }
}
