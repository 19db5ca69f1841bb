package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.{CosineSimilarityExpr, DotProductExpr}
import graft.plans.TopKStrategy

/** Canonical extension point: enables graft on any session at build time —
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *
  * or via config, with no code dependency at the call site:
  *
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * Injects the TopKPerKey planner strategy and registers the native vector
  * functions for SQL (`graft_cosine`, `graft_dot`). `GraftSession.local`
  * and `TopKPerKey.topKPerKey` also self-register for ad-hoc sessions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft.functions", "graft_cosine"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          CosineSimilarityExpr(exprs.head, exprs(1))))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft.functions", "graft_dot"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          DotProductExpr(exprs.head, exprs(1))))
  }
}
