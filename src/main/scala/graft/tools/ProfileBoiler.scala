package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._
import graft.functions._

/** Scratch profiler for the boilerplate census: which stage of the
  * window-stream pass actually costs (explode, md5, per-doc agg, census). */
object ProfileBoiler {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local(16)
    import graft.operators.Dedup.SubstrGram
    def docs = graft.sources.Tables.load(s, sf, "documents")
      .select(col("doc_id"), col("text"))
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    val g0 = docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(wordShingles(wsTokens(col("text")), SubstrGram)).as("g"))
    g0.count() // warm
    time("scan+explode")(g0.count())
    val gTok = docs.repartition(col("doc_id"))
      .select(col("doc_id"), wsTokens(col("text")).as("toks"))
      .select(col("doc_id"), explode(wordShingles(col("toks"), SubstrGram)).as("g"))
    time("scan+explode (toks col)")(gTok.count())
    time("scan+explode (toks col) 2")(gTok.count())
    time("scan+explode+md5")(g0.select(col("doc_id"), md5Hex(col("g")).as("gh")).count())
    val perDoc = g0.select(col("doc_id"), md5Hex(col("g")).as("gh"))
      .groupBy("doc_id", "gh").agg(count(lit(1)).as("occ"))
    time("...+perDoc agg")(perDoc.count())
    val top = perDoc.groupBy("gh")
      .agg(count(lit(1)).as("n_docs"), sum(col("occ")).as("n_occurrences"),
        min(col("doc_id")).as("exdoc"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("n_occurrences").desc, col("gh").asc)
      .limit(20)
    time("...+census topK")(top.count())
    time("full query")(graft.operators.Dedup.boilerplateTopK(s, sf).count())
    time("full query again")(graft.operators.Dedup.boilerplateTopK(s, sf).count())
    s.stop()
  }
}
