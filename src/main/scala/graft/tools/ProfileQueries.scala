package graft.tools

import graft.GraftSession

/** Scratch: isolated warm timing of named gated queries —
  * `runMain graft.tools.ProfileQueries <sfDir> <name> [name ...]` —
  * cold + best-of-3 warm per query, for separating bench-run context
  * effects (GC debris, page-cache state) from real per-query cost. */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val s = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    for (n <- names; fn <- graft.SparkEntry.queries.get(n)) {
      def t(): Double = {
        val t0 = System.nanoTime(); fn(s, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = t()
      val warm = Seq(t(), t(), t()).min
      println(f"[pq] $n%-28s cold $cold%7.2f s   warm $warm%7.2f s")
    }
    s.stop()
  }
}
