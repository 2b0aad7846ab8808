package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
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
  * array; result distinct (first-occurrence order) unless
  * `distinct = false` (every occurrence, document order — frequency
  * consumers like heavy hitters need the multiset).
  */
case class Shingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {
  require(n >= 1, "shingle width must be >= 1")

  override def inputTypes: Seq[org.apache.spark.sql.GraftInternals.AbstractType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // limit -1 keeps trailing empty tokens, matching Spark's split(col, " ",
    // -1) and DuckDB's string_split on trailing-separator inputs
    val toks = text.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val m = toks.length - n + 1
    val seen: java.util.Collection[String] =
      if (distinct) new java.util.LinkedHashSet[String](m * 2)
      else new java.util.ArrayList[String](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
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

/** Native single-pass blocklist token masking (see
  * [[TextFunctions.redactDeclarative]] for the interpreted-HOF twin the
  * specs cross-check against). Semantics contract, aligned with the
  * DuckDB oracle: tokens = single-space split keeping trailing empties;
  * every token equal to a blocklist entry becomes `mask`; tokens rejoin
  * with one space. */
case class RedactTokens(child: Expression, blocklist: Seq[String],
    mask: String) extends UnaryExpression with CodegenFallback
    with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftInternals.AbstractType] = Seq(StringType)
  override def dataType: DataType = StringType

  @transient private lazy val banned: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](blocklist.size * 2)
    blocklist.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = text.split(" ", -1)
    val sb = new java.lang.StringBuilder(text.length + 16)
    var i = 0
    while (i < toks.length) {
      if (i > 0) sb.append(' ')
      sb.append(if (banned.contains(toks(i))) mask else toks(i))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "redact_tokens"
}

/** Occurrence count of blocklisted tokens — the single-pass twin of
  * [[RedactTokens]] for masking-rate stats without building the masked
  * string. */
case class RedactCount(child: Expression, blocklist: Seq[String])
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {

  override def inputTypes: Seq[org.apache.spark.sql.GraftInternals.AbstractType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  @transient private lazy val banned: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](blocklist.size * 2)
    blocklist.foreach(s.add)
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    var i = 0
    var c = 0
    while (i < toks.length) {
      if (banned.contains(toks(i))) c += 1
      i += 1
    }
    c
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "redact_count"
}

object TextExpressions {
  import org.apache.spark.sql.GraftInternals.{column, expression}
  def shingles(text: Column, n: Int): Column =
    column(Shingles(expression(text), n))
  def shinglesAll(text: Column, n: Int): Column =
    column(Shingles(expression(text), n, distinct = false))
  def redact(text: Column, blocklist: Seq[String], mask: String): Column =
    column(RedactTokens(expression(text), blocklist, mask))
  def redactCount(text: Column, blocklist: Seq[String]): Column =
    column(RedactCount(expression(text), blocklist))
}
