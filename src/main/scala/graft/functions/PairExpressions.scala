package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native pair/signature expressions for the candidate-generation hot path.
  *
  * `OrderedPairsExpr` expands a (sorted) array into all i<j element pairs —
  * the bucket-local quadratic step of LSH candidate generation. The
  * declarative flatten(transform(transform(slice...))) formulation builds
  * every pair through interpreted lambda calls; this is one nested loop.
  *
  * `HyperplaneSignExpr` computes the random-hyperplane LSH signature
  * (SURVEY §2C sim_ann_lsh): plane p's coefficient for dimension d is +1
  * when md5("p_d")'s first byte >= 0x80 — deterministic and replayable.
  * Each component is quantized to an integer first — floor(v*1024 + 0.5),
  * exact for floats since 1024 is a power of two — so the projection sum is
  * pure 64-bit integer math: order-independent, overflow-free (|q| < 2^34
  * for any float*1024 that fits, x 64 dims << 2^63), and bit-for-bit
  * replayable by any engine. A float dot product would make the sign of
  * near-zero projections depend on accumulation order; integers cannot.
  */
case class OrderedPairsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private lazy val elementType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", elementType), StructField("b", elementType))),
    containsNull = false)
  override def prettyName: String = "graft_ordered_pairs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[AnyRef]((n.toLong * (n - 1) / 2).toInt)
    var idx = 0
    var i = 0
    while (i < n) {
      val a = arr.get(i, elementType)
      var j = i + 1
      while (j < n) {
        out(idx) = new GenericInternalRow(Array[Any](a, arr.get(j, elementType)))
        idx += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** numPlanes-bit signature from deterministic md5-derived hyperplane signs. */
case class HyperplaneSignExpr(child: Expression, numPlanes: Int, dims: Int)
    extends UnaryExpression with CodegenFallback {

  // LongType: multi-table signatures pack up to 64 plane bits; an Int sign
  // bit would flip negative at plane 31.
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_sign"

  @transient private lazy val signs: Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dims) { (p, d) =>
      val firstByte = md.digest(s"${p}_$d".getBytes("UTF-8")).head & 0xff
      if (firstByte >= 128) 1L else -1L
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dims)
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      val s = signs(p)
      var dot = 0L
      var d = 0
      while (d < n) {
        dot += math.floor(v.getFloat(d).toDouble * 1024.0 + 0.5).toLong * s(d)
        d += 1
      }
      if (dot > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PairExpressions {
  def orderedPairs(arr: Column): Column =
    CatalystBridge.column(OrderedPairsExpr(CatalystBridge.expression(arr)))

  def lshSign(emb: Column, numPlanes: Int, dims: Int): Column =
    CatalystBridge.column(HyperplaneSignExpr(CatalystBridge.expression(emb), numPlanes, dims))
}
