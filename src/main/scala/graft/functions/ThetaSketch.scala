package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** KMV ("k minimum values") theta sketch over pre-hashed ids: the k
  * smallest DISTINCT hash values (Beyer et al., "On synopses for
  * distinct-value estimation under multiset operations", SIGMOD 2007).
  *
  * The scale story mirrors [[BitmapAggBytes]] with bounded state: where
  * the exact bitmap grows with the id universe, a KMV sketch is k longs
  * forever — build one per segment in a single fact scan, then estimate
  * distinct counts AND set intersections on the tiny segment table
  * ([[KmvIntersectEstimate]]), which HLL cannot do (union-only).
  *
  * Two properties the specs pin:
  *  - The sketch STATE is order- and partitioning-invariant (the k
  *    smallest of a set is a pure set function), so results are exact
  *    decimals, not merely bounded — and a SQL oracle reproduces the
  *    whole estimator bit-for-bit from `row_number() <= k`.
  *  - Below k distinct values the sketch holds everything and every
  *    estimate is EXACT (θ = the full domain).
  *
  * Callers feed non-negative hashes from a fixed domain [0, 2^60) — the
  * engine's md5-prefix bridge (`conv(substr(md5(x),1,15),16,10)`) —
  * so the estimator arithmetic is portable (2^60 and k·2^60 are exact
  * doubles; DuckDB reproduces the hash with its own md5).
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvSketchAgg.Buffer] {

  require(k >= 2, s"k must be >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvSketchAgg.Buffer =
    new KmvSketchAgg.Buffer(k)

  override def update(buf: KmvSketchAgg.Buffer,
      input: InternalRow): KmvSketchAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KmvSketchAgg.Buffer,
      b: KmvSketchAgg.Buffer): KmvSketchAgg.Buffer = {
    b.values.foreach(a.add)
    a
  }

  override def eval(buf: KmvSketchAgg.Buffer): Any =
    new GenericArrayData(buf.sortedAsc)

  override def serialize(buf: KmvSketchAgg.Buffer): Array[Byte] = {
    val arr = buf.sortedAsc
    val bb = ByteBuffer.allocate(4 + arr.length * 8)
    bb.putInt(arr.length)
    arr.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvSketchAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new KmvSketchAgg.Buffer(k)
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "kmv_sketch"
}

object KmvSketchAgg {
  /** The k smallest distinct longs seen so far. TreeSet keeps both the
    * distinctness check and the current max at O(log k); k is small
    * (64-4096), so this is never the bottleneck against the scan. */
  final class Buffer(k: Int) {
    private val set = mutable.TreeSet.empty[Long]

    def add(v: Long): Unit =
      if (set.size < k) set += v
      // after a successful insert of v < max the max is unchanged, so
      // dropping `last` evicts the previous worst and keeps size == k
      else if (v < set.last && set.add(v)) set -= set.last

    def values: Iterator[Long] = set.iterator
    def sortedAsc: Array[Long] = set.toArray
  }

  /** Column API: `kmvSketch(hash, k)` aggregate — hash must already be
    * integral (the caller picks the hash; see the scaladoc). */
  def kmvSketch(hash: Column, k: Int): Column =
    column(KmvSketchAgg(expression(hash.cast("long")), k)
      .toAggregateExpression())
}

/** Distinct-count estimate from a KMV sketch: exact size when the sketch
  * is not full, else the classic (k−1)·D/v₍ₖ₎ with D the hash domain.
  * Returns an unrounded double — callers round for reporting. */
case class KmvDistinctEstimate(child: Expression, k: Int, domain: Long)
  extends UnaryExpression with CodegenFallback {

  require(k >= 2 && domain > 0)

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) n.toDouble
    else (k - 1).toDouble * domain.toDouble / arr.getLong(n - 1).toDouble
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "kmv_estimate"
}

object KmvDistinctEstimate {
  def kmvEstimate(sketch: Column, k: Int,
      domain: Long = KmvIntersectEstimate.Md5Domain): Column =
    column(KmvDistinctEstimate(expression(sketch), k, domain))
}

/** Intersection-size estimate of two KMV sketches: θ = the smaller of
  * the two thresholds (v₍ₖ₎ when full, the domain bound when not), the
  * common values below θ counted by a sorted merge walk, scaled by D/θ.
  * When neither sketch is full, θ = D and the result is EXACTLY
  * |A ∩ B| — the estimator degrades to truth on small segments. */
case class KmvIntersectEstimate(left: Expression, right: Expression,
    k: Int, domain: Long)
  extends BinaryExpression with CodegenFallback {

  require(k >= 2 && domain > 0)

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val thetaX = if (nx < k) domain else x.getLong(nx - 1)
    val thetaY = if (ny < k) domain else y.getLong(ny - 1)
    val theta = math.min(thetaX, thetaY)
    var i = 0; var j = 0; var common = 0L
    while (i < nx && j < ny) {
      val vx = x.getLong(i); val vy = y.getLong(j)
      if (vx < vy) i += 1
      else if (vx > vy) j += 1
      else {
        if (vx < theta) common += 1
        i += 1; j += 1
      }
    }
    common.toDouble * domain.toDouble / theta.toDouble
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kmv_intersect_estimate"
}

object KmvIntersectEstimate {
  /** Domain of the engine's md5-prefix 60-bit hash bridge. */
  val Md5Domain: Long = 1L << 60

  def kmvIntersect(a: Column, b: Column, k: Int,
      domain: Long = Md5Domain): Column =
    column(KmvIntersectEstimate(expression(a), expression(b), k, domain))
}
