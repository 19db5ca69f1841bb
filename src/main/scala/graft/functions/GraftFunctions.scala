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
  *   graft_shingles(text, n)      n-token shingles of single-space text
  *   graft_minhash(text, k, n)    k derived-hash MinHash values (bigint)
  *   graft_lsh_sign(emb, p, d)    p-plane hyperplane signature (bigint)
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

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (exprs => CosineSimilarityExpr(exprs.head, exprs(1))),
    "graft_dot" -> (exprs => DotProductExpr(exprs.head, exprs(1))),
    "graft_shingles" -> (exprs =>
      WordShinglesExpr(exprs.head, intArg(exprs(1), "n"))),
    "graft_minhash" -> (exprs =>
      MinHashSigExpr(exprs.head, intArg(exprs(1), "k"), intArg(exprs(2), "n"))),
    "graft_lsh_sign" -> (exprs =>
      HyperplaneSignExpr(exprs.head, intArg(exprs(1), "numPlanes"), intArg(exprs(2), "dims"))))

  /** Ad-hoc registration on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
