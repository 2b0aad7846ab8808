package graft

import graft.functions.{DotProduct, Shingles, SquaredL2}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Catalyst integration point: registers the engine's native expressions as
  * SQL functions, so `spark.sql("SELECT squared_l2(a, b) ...")` works and
  * the kernels are usable from pure-SQL pipelines.
  *
  * Activate with:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)                    // in-process
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scalar_func")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("squared_l2"),
      info("squared_l2", "squared_l2(a, b) - squared L2 distance of two float/double arrays"),
      (args: Seq[Expression]) => SquaredL2(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two float/double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("shingles"),
      info("shingles", "shingles(text, n) - distinct word n-gram shingles"),
      (args: Seq[Expression]) => {
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => other.eval().asInstanceOf[Int]
        }
        Shingles(args(0), n)
      }))
  }
}

object GraftExtensions {
  /** Register the same functions on an already-built session (useful in
    * tests and notebooks where the builder is out of reach). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("squared_l2"),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, "squared_l2"),
      (args: Seq[Expression]) => SquaredL2(args(0), args(1)))
    reg.registerFunction(
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1)))
    reg.registerFunction(
      FunctionIdentifier("shingles"),
      new ExpressionInfo(classOf[GraftExtensions].getName, null, "shingles"),
      (args: Seq[Expression]) => Shingles(args(0),
        args(1).eval().asInstanceOf[Int]))
  }
}
