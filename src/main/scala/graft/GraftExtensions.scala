package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.GraftFunctions
import graft.plans.TopKStrategy

/** Canonical extension point: enables graft on any session at build time —
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *
  * or via config, with no code dependency at the call site:
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * Injects the TopKPerKey planner strategy and registers every native graft
  * expression for SQL (`graft_cosine`, `graft_dot`, `graft_shingles`,
  * `graft_minhash`, `graft_lsh_sign`). `GraftSession.local` and
  * `TopKPerKey.topKPerKey` also self-register for ad-hoc sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKStrategy)
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        (exprs: Seq[Expression]) => builder(exprs)))
    }
  }
}
