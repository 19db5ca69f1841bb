package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native hashed char-bigram bucket counts for the learned language model
  * (TextOps.langidModel).
  *
  * The declarative formulation — split(text, "") to a per-char array, then
  * `buckets` separate filter() passes over a transform(sequence(...)) bigram
  * array — walks interpreted higher-order-function lambdas: O(buckets · len)
  * per document with per-element Column-lambda overhead, measured at ~21 s
  * for the sf0.1 scoring pass. This expression makes ONE pass over the
  * string (O(len)), incrementing a small long[] histogram — the same shape
  * ShingleExpressions gives the dedup path.
  *
  * Bucket rule (shared verbatim with the SQL oracle):
  * (codepoint(c_i) * 31 + codepoint(c_{i+1})) mod buckets, exactly
  * ascii(substr(text, i, 1)) semantics for BMP text. */
object LangidBytes {
  def bucketCounts(text: UTF8String, buckets: Int): GenericArrayData = {
    val s = text.toString
    val out = new Array[Long](buckets)
    var i = 0
    val n = s.length - 1
    while (i < n) {
      val b = (s.charAt(i) * 31 + s.charAt(i + 1)) % buckets
      out(b) += 1L
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class BigramBucketCountsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bigram_buckets"

  override def nullSafeEval(input: Any): Any =
    LangidBytes.bucketCounts(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.LangidBytes.bucketCounts($c, $buckets);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LangidExpressions {
  /** Column wrapper: per-row long[buckets] histogram of hashed char
    * bigrams, one codegen'd pass per document. */
  def bigramBuckets(text: Column, buckets: Int): Column =
    CatalystBridge.column(BigramBucketCountsExpr(CatalystBridge.expression(text), buckets))
}
