package graft.tools
import graft.GraftSession
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local(32)
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    graft.operators.Dedup.clusterAssign(s, sf).count() // warm JIT on the target corpus
    for (_ <- 1 to 2) {
      time("dedup_clusters")(graft.operators.Dedup.clusterAssign(s, sf).count())
      time("dedup_survivors")(graft.operators.Dedup.survivors(s, sf).count())
      time("pipeline_curate_neardup")(graft.operators.Pipeline.curateNearDup(s, sf).count())
    }
    s.stop()
  }
}
