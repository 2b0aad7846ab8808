package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst kernels for the hot path of the ε-neighborhood self-join.
  *
  * The reference engine's innermost loop is a squared-L2 distance
  * accumulation over float32 coordinates (reference `kdtree2.cpp:12-14`,
  * `:529-539`, `:620-630`). Re-expressed here as a codegen'd binary
  * expression over `array<float>` / `array<double>` columns so it stays
  * inside whole-stage codegen (no UDF boxing) — at 100 TB this expression
  * is evaluated per candidate pair, so it must compile to a tight JIT'd
  * loop, which `doGenCode` below guarantees.
  *
  * Numerics: each element is widened to double before subtraction and the
  * accumulation is a left-to-right double fold — this exactly matches the
  * DuckDB oracle formula `list_sum(list_transform(list_zip(a::DOUBLE[],
  * b::DOUBLE[]), x -> (x[1]-x[2])*(x[1]-x[2])))`, making threshold
  * comparisons bit-identical between engine and oracle.
  */
abstract class VectorFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  /** Java source for the per-element update of accumulator `acc` given
    * element values `xv` and `yv` (already widened to double). */
  protected def elementUpdate(acc: String, xv: String, yv: String): String
  /** Scala-side per-element update for interpreted eval. */
  protected def update(acc: Double, x: Double, y: Double): Double

  private def elemDouble(arr: ArrayData, et: DataType, i: Int): Double =
    et match {
      case org.apache.spark.sql.types.FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

  private def leftElemType: DataType =
    left.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
  private def rightElemType: DataType =
    right.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val let = leftElemType
    val ret = rightElemType
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc = update(acc, elemDouble(x, let, i), elemDouble(y, ret, i))
      i += 1
    }
    acc
  }

  private def getJava(et: DataType, arr: String, i: String): String = et match {
    case org.apache.spark.sql.types.FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${getJava(leftElemType, x, i)};
         |  double $yv = ${getJava(rightElemType, y, i)};
         |  ${elementUpdate(acc, xv, yv)}
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Squared Euclidean distance between two float/double vectors
  * (reference `kdtree2.cpp:529-539`: float accumulation with early exit;
  * we accumulate in double — more accurate, and the early exit is moot
  * under vectorized evaluation). */
case class SquaredL2(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override protected def elementUpdate(acc: String, xv: String, yv: String) =
    s"$acc += ($xv - $yv) * ($xv - $yv);"
  override protected def update(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "squared_l2"
}

/** Dot product between two float/double vectors — the kernel of cosine
  * similarity for ANN / embedding near-dup. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override protected def elementUpdate(acc: String, xv: String, yv: String) =
    s"$acc += $xv * $yv;"
  override protected def update(acc: Double, x: Double, y: Double): Double =
    acc + x * y
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

object VectorExpressions {
  import org.apache.spark.sql.GraftInternals.{column, expression}
  /** Column API for the codegen'd kernels. */
  def squaredL2(a: Column, b: Column): Column =
    column(SquaredL2(expression(a), expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
}
