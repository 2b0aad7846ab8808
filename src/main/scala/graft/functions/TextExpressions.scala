package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass word-n-gram shingling.
  *
  * The declarative formulation (split → transform(sequence(...)) →
  * concat_ws → array_distinct) is correct but slow: Spark's higher-order
  * functions are evaluated with interpreted lambdas (no whole-stage
  * codegen), costing ~25 µs/document. This expression does the same work
  * in one Scala pass (~1 µs/document): split on single space, slide an
  * n-window, dedup preserving first-occurrence order.
  *
  * Semantics contract (must stay aligned with the DuckDB oracle
  * formulation in SparkEntry.jaccardOracle): tokens = single-space split;
  * shingle = tokens joined by one space; docs with < n tokens → empty
  * array; result distinct.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // limit -1 keeps trailing empty tokens, matching Spark's split(col, " ",
    // -1) and DuckDB's string_split on trailing-separator inputs
    val toks = text.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "shingles"
}

object TextExpressions {
  import org.apache.spark.sql.GraftInternals.{column, expression}
  def shingles(text: Column, n: Int): Column =
    column(Shingles(expression(text), n))
}
