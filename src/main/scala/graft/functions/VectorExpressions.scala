package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the vector hot path (SURVEY §2E).
  *
  * The `functions.aggregate`/`zip_with` formulation of a dot product walks
  * the arrays through interpreted higher-order-function lambdas — three
  * passes (dot, |a|, |b|) of per-element closure calls. These expressions do
  * one fused primitive loop and participate in whole-stage codegen, which is
  * what a 100 TB similarity pass needs (the pairwise stage is pure CPU).
  *
  * Accumulation is left-to-right in double precision — bit-identical to the
  * SQL oracle's list_sum(list_transform(...)) formulation.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  // Accept array<float> or array<double> on either side (trained IVF
  // centroids are double-valued means; raw embeddings are floats).
  private def isDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  @transient private lazy val leftDouble = isDouble(left)
  @transient private lazy val rightDouble = isDouble(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (leftDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (rightDouble) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    // zero-norm guard: a zero vector has no direction — its similarity to
    // anything is 0, never NaN (Spark SQL orders NaN ABOVE every number,
    // so an unguarded 0/0 would make zero vectors "similar" to everything
    // above any threshold; caught by the degenerate-embeddings sweep)
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      val getX = if (leftDouble) s"$x.getDouble($i)" else s"(double) $x.getFloat($i)"
      val getY = if (rightDouble) s"$y.getDouble($i)" else s"(double) $y.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $getX;
         |  double $yi = $getY;
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 :
         |  $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused double-precision dot product over two array<float> columns. */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between a 1/1024-grid-quantized vector (array<long>)
  * and a double-valued centroid (array<double>) — the PQ subspace kernel.
  * Left-to-right double accumulation of (q/1024 - c)^2: bit-identical to
  * the aggregate(zip_with(...)) HOF formulation AND the oracle's ordered
  * list_sum (long->double conversion is exact below 2^53; /1024 is a
  * power-of-two scale), just without per-element interpreted lambdas —
  * the difference between 6 s and sub-second for the PQ encode pass. */
case class GridL2Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_grid_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    val n = math.min(q.numElements(), c.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = q.getLong(i) / 1024.0 - c.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($q.numElements(), $c.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $q.getLong($i) / 1024.0 - $c.getDouble($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-level entry points. */
  def cosine(a: Column, b: Column): Column =
    CatalystBridge.column(CosineSimilarityExpr(CatalystBridge.expression(a), CatalystBridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    CatalystBridge.column(DotProductExpr(CatalystBridge.expression(a), CatalystBridge.expression(b)))

  def gridL2(q: Column, c: Column): Column =
    CatalystBridge.column(GridL2Expr(CatalystBridge.expression(q), CatalystBridge.expression(c)))

  /** SQL registration of the full native function set (delegates to the
    * shared builder table in [[GraftFunctions]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftFunctions.register(spark)
}
