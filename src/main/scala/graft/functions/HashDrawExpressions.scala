package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftInternals.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for deterministic hash-seeded draws
  * ([[graft.operators.Stats.poissonBootstrap]]'s hot path).
  *
  * The SQL formulation of the inverse-CDF draw — 8 × (substring + a
  * 9-deep CASE ladder) per digest — measured ~10 µs/row at sf0.1
  * (~3 s of the bootstrap's bill): each slot allocates a substring and
  * walks the CASE tree through codegen'd UTF8String comparisons. One
  * interpreted pass over the digest's 32 hex chars does all 8 slots in
  * ~0.1 µs/row; losing whole-stage fusion for this single projection
  * costs far less than the expression tree it replaces.
  *
  * Semantics are IDENTICAL to the SQL ladder (and to the DuckDB oracle's
  * arithmetic form): slot s draws the 16-bit integer h16 from hex chars
  * [4s, 4s+4), and the Poisson(1) multiplicity is the smallest k with
  * h16 ≤ bounds(k), else bounds.length — where bounds(k) is the largest
  * integer h16 with (h16 + 0.5)/65536 < CDF(k), precomputed exactly in
  * the caller (power-of-2 scaling keeps every comparison exact).
  */
case class PoissonOctet(child: Expression, bounds: Seq[Int])
    extends UnaryExpression with CodegenFallback {
  require(bounds.nonEmpty && bounds == bounds.sorted,
    "bounds must be ascending CDF thresholds")
  private val boundsArr = bounds.toArray
  private val maxK = boundsArr.length

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"expected a hex string digest, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    require(s.numBytes >= 32,
      s"digest must be >= 32 hex chars, got ${s.numBytes}")
    val out = new Array[Int](8)
    var slot = 0
    while (slot < 8) {
      var h = 0
      var i = slot * 4
      val end = i + 4
      while (i < end) {
        val c = s.getByte(i)
        val nib =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else throw new IllegalArgumentException(
            s"non-hex digest char '${c.toChar}'")
        h = (h << 4) | nib
        i += 1
      }
      var k = 0
      while (k < maxK && h > boundsArr(k)) k += 1
      out(slot) = k
      slot += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PoissonOctet = copy(child = newChild)
  override def prettyName: String = "poisson_octet"
}

object HashDrawExpressions {
  /** All 8 Poisson multiplicities of a 32-hex-char digest, as
    * `array<int>` — see [[PoissonOctet]]. */
  def poissonOctet(digest: Column, bounds: Seq[Int]): Column =
    column(PoissonOctet(expression(digest), bounds))
}
