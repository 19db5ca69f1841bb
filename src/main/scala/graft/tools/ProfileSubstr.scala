package graft.tools

import graft.GraftSession

/** Scratch profiler for the substring-dedup path (cold/warm at a given SF). */
object ProfileSubstr {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.local(16)
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    graft.operators.Dedup.substringDup(s, sf).count() // warm JIT on the target corpus
    time("substringDup cold")(graft.operators.Dedup.substringDup(s, sf).count())
    time("substringDup warm")(graft.operators.Dedup.substringDup(s, sf).count())
    time("substringDup warm2")(graft.operators.Dedup.substringDup(s, sf).count())
    s.stop()
  }
}
