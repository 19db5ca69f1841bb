package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** The SQL surface of every native graft expression — one builder table
  * shared by `GraftExtensions` (spark.sql.extensions path) and
  * `GraftFunctions.register` (ad-hoc session path), so both routes expose
  * the identical function set:
  *
  *   graft_cosine(a, b)            cosine similarity over float/double arrays
  *   graft_dot(a, b)               dot product over float arrays
  *   graft_grid_l2(q, c)           squared L2: 1/1024-grid longs vs doubles
  *   graft_shingles(text, n)      n-token shingles of single-space text
  *   graft_minhash(text, k, n)    k derived-hash MinHash values (bigint)
  *   graft_simhash64(text)        64-bit SimHash of the tokens (bigint)
  *   graft_lsh_sign(emb, p, d)    p-plane hyperplane signature (bigint)
  *   graft_gensort_record(n)      100-byte gensort record n (binary)
  *
  * Integer parameters must be literals (they shape the expression itself,
  * exactly like the DataFrame-side constructors).
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e.eval() match {
    case n: Number => n.intValue()
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  // Arity-checked up front: SQL callers reach these through the analyzer,
  // and a raw IndexOutOfBounds from exprs(2) is a far worse error than
  // "graft_minhash expects 3 arguments".
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${exprs.length}")
      build(exprs)
    }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> arity("graft_cosine", 2)(exprs =>
      CosineSimilarityExpr(exprs.head, exprs(1))),
    "graft_dot" -> arity("graft_dot", 2)(exprs =>
      DotProductExpr(exprs.head, exprs(1))),
    "graft_grid_l2" -> arity("graft_grid_l2", 2)(exprs =>
      GridL2Expr(exprs.head, exprs(1))),
    "graft_shingles" -> arity("graft_shingles", 2)(exprs =>
      WordShinglesExpr(exprs.head, intArg(exprs(1), "n"))),
    "graft_minhash" -> arity("graft_minhash", 3)(exprs =>
      MinHashSigExpr(exprs.head, intArg(exprs(1), "k"), intArg(exprs(2), "n"))),
    "graft_simhash64" -> arity("graft_simhash64", 1)(exprs =>
      SimHash64Expr(exprs.head)),
    "graft_lsh_sign" -> arity("graft_lsh_sign", 3)(exprs =>
      HyperplaneSignExpr(exprs.head, intArg(exprs(1), "numPlanes"), intArg(exprs(2), "dims"))),
    "graft_gensort_record" -> arity("graft_gensort_record", 1)(exprs =>
      GensortRecordExpr(exprs.head)))

  /** Ad-hoc registration on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
