package graft.tools
import graft.GraftSession
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local(32)
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[profile] $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    // warm the scan + JIT on the target corpus (a hardcoded warm-up
    // path would crash runs pointed at a custom corpus location)
    graft.operators.Similarity.annIvf(s, sf).count()
    graft.operators.Similarity.annIvfPq(s, sf).count()
    for (_ <- 1 to 2) {
      time("sim_ann_ivf")(graft.operators.Similarity.annIvf(s, sf).count())
      time("sim_ann_pq")(graft.operators.Similarity.annPq(s, sf).count())
      time("sim_ann_ivfpq")(graft.operators.Similarity.annIvfPq(s, sf).count())
    }
    s.stop()
  }
}
