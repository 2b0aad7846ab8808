package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftInternals.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Exact distinct-count aggregate over 64-bit ids backed by a Roaring-style
  * two-level bitmap (Chambi et al., "Better bitmap performance with Roaring
  * bitmaps", 2016).
  *
  * Why not `count(distinct x)`: Catalyst rewrites multi-distinct aggregates
  * through an Expand node — the input is replicated once PER distinct
  * column before the exchange, and the distinct keys themselves cross the
  * shuffle. At 100 TB that replication is the dominant cost. This aggregate
  * keeps one compressed bitmap per group: the map side absorbs every
  * occurrence locally (set-bit is idempotent), only group-count × bitmap
  * bytes cross the wire, and any number of distinct measures still reads
  * the fact table ONCE with no Expand (plan-pinned in BitmapAggSpec).
  *
  * Structure: values are bucketed by their high 48 bits (arithmetic shift —
  * negative ids get their own buckets); each bucket covers 65536 consecutive
  * values with either a sorted-array container (≤ 4096 entries, 2 B/value)
  * or a packed bit container (8 KiB fixed), upgrading on overflow — the
  * classic Roaring containers, reimplemented (no external deps).
  *
  * The reference's analog is the dense cluster-membership bit vectors kept
  * per rank (`dbscan.h:52-57` parallel vectors indexed by local point id);
  * this is the same idea made sparse-safe and mergeable across a shuffle.
  */
case class BitmapDistinctCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Int64Bitmap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Int64Bitmap = new Int64Bitmap

  override def update(buf: Int64Bitmap, input: InternalRow): Int64Bitmap = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Int64Bitmap, b: Int64Bitmap): Int64Bitmap = {
    a.or(b); a
  }

  override def eval(buf: Int64Bitmap): Any = buf.cardinality

  override def serialize(buf: Int64Bitmap): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): Int64Bitmap =
    Int64Bitmap.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapDistinctCount =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapDistinctCount =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "bitmap_distinct_count"
}

object BitmapDistinctCount {
  /** Column API: exact `count(distinct id)` without the Expand rewrite.
    * The child must be integral; it is cast to long here. */
  def bitmapDistinct(id: Column): Column =
    column(BitmapDistinctCount(expression(id.cast("long")))
      .toAggregateExpression())
}

/** Like [[BitmapDistinctCount]] but the aggregate VALUE is the serialized
  * bitmap itself — the audience-analytics building block: build one
  * compressed id-set per segment in a single fact scan, then intersect
  * the (tiny, group-count-sized) bitmap table pairwise with
  * [[BitmapAndCount]] for exact overlap / Jaccard between any two
  * segments, the way Roaring-backed OLAP stores answer "how many users
  * did both A and B" without re-scanning the fact table per pair.
  *
  * The wire form is deterministic (sorted buckets), so the output is
  * partitioning- and order-invariant down to the bytes. */
case class BitmapAggBytes(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Int64Bitmap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Int64Bitmap = new Int64Bitmap

  override def update(buf: Int64Bitmap, input: InternalRow): Int64Bitmap = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Int64Bitmap, b: Int64Bitmap): Int64Bitmap = {
    a.or(b); a
  }

  override def eval(buf: Int64Bitmap): Any = buf.toBytes

  override def serialize(buf: Int64Bitmap): Array[Byte] = buf.toBytes

  override def deserialize(bytes: Array[Byte]): Int64Bitmap =
    Int64Bitmap.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapAggBytes =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapAggBytes =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "bitmap_bytes"
}

object BitmapAggBytes {
  def bitmapBytes(id: Column): Column =
    column(BitmapAggBytes(expression(id.cast("long")))
      .toAggregateExpression())
}

/** Exact |A ∩ B| of two serialized [[Int64Bitmap]]s. Runs on the
  * aggregated segment table (rows = segment count, not fact rows), so
  * interpreted eval is fine; the container-level intersection never
  * materializes the intersection set. */
case class BitmapAndCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Int64Bitmap.fromBytes(a.asInstanceOf[Array[Byte]])
      .andCardinality(Int64Bitmap.fromBytes(b.asInstanceOf[Array[Byte]]))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bitmap_and_count"
}

object BitmapAndCount {
  def bitmapAndCount(a: Column, b: Column): Column =
    column(BitmapAndCount(expression(a), expression(b)))
}

/** Mutable two-level bitmap over the full signed 64-bit id space. */
final class Int64Bitmap {
  import Int64Bitmap._

  // high-48-bit bucket -> container; LongMap gives O(1) adds, keys are
  // sorted only at serialize time so wire bytes are deterministic
  private val buckets = mutable.LongMap.empty[Container]

  def add(v: Long): Unit = {
    val hi = v >> 16
    val lo = (v & 0xFFFFL).toInt
    buckets.getOrNull(hi) match {
      case null =>
        val c = new Container
        c.add(lo)
        buckets.update(hi, c)
      case c => c.add(lo)
    }
  }

  def or(other: Int64Bitmap): Unit =
    other.buckets.foreach { case (hi, c) =>
      buckets.getOrNull(hi) match {
        case null => buckets.update(hi, c.copy())
        case mine => mine.or(c)
      }
    }

  def cardinality: Long = {
    var n = 0L
    buckets.foreach { case (_, c) => n += c.cardinality }
    n
  }

  def contains(v: Long): Boolean = {
    val c = buckets.getOrNull(v >> 16)
    c != null && c.contains((v & 0xFFFFL).toInt)
  }

  /** Exact |this ∩ other| without materializing the intersection:
    * iterate the smaller bucket map, probe the larger. */
  def andCardinality(other: Int64Bitmap): Long = {
    val (small, large) =
      if (buckets.size <= other.buckets.size) (this, other)
      else (other, this)
    var n = 0L
    small.buckets.foreach { case (hi, c) =>
      large.buckets.getOrNull(hi) match {
        case null =>
        case d => n += c.intersectCount(d)
      }
    }
    n
  }

  private[functions] def put(hi: Long, c: Int64Bitmap.Container): Unit =
    buckets.update(hi, c)

  def toBytes: Array[Byte] = {
    val keys = buckets.keys.toArray.sorted
    var size = 4
    keys.foreach { k => size += 8 + 1 + 4 + buckets(k).payloadBytes }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(keys.length)
    keys.foreach { k =>
      bb.putLong(k)
      buckets(k).writeTo(bb)
    }
    bb.array()
  }
}

object Int64Bitmap {
  /** Array/bitmap container for one 65536-value bucket. Array mode keeps
    * sorted distinct 16-bit values (as Char for unsigned order); past
    * ArrayCap entries it upgrades to a 1024-word bit container, the
    * break-even point where 2 B/entry exceeds the 8 KiB fixed cost. */
  final class Container {
    private[Int64Bitmap] var arr: Array[Char] = new Array[Char](8)
    private[Int64Bitmap] var n: Int = 0
    private[Int64Bitmap] var words: Array[Long] = null

    def add(lo: Int): Unit =
      if (words != null) words(lo >>> 6) |= 1L << (lo & 63)
      else {
        val pos = search(lo.toChar)
        if (pos < 0) {
          val ins = -pos - 1
          if (n == ArrayCap) {
            upgrade()
            words(lo >>> 6) |= 1L << (lo & 63)
          } else {
            if (n == arr.length)
              arr = java.util.Arrays.copyOf(arr, arr.length * 2)
            System.arraycopy(arr, ins, arr, ins + 1, n - ins)
            arr(ins) = lo.toChar
            n += 1
          }
        }
      }

    def contains(lo: Int): Boolean =
      if (words != null) (words(lo >>> 6) & (1L << (lo & 63))) != 0
      else search(lo.toChar) >= 0

    private def search(c: Char): Int = {
      var lo = 0; var hi = n - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid) < c) lo = mid + 1
        else if (arr(mid) > c) hi = mid - 1
        else return mid
      }
      -(lo + 1)
    }

    private def upgrade(): Unit = {
      words = new Array[Long](1024)
      var i = 0
      while (i < n) {
        val lo = arr(i).toInt
        words(lo >>> 6) |= 1L << (lo & 63)
        i += 1
      }
      arr = null; n = 0
    }

    def or(other: Container): Unit =
      if (other.words != null) {
        if (words == null) upgrade()
        var i = 0
        while (i < 1024) { words(i) |= other.words(i); i += 1 }
      } else {
        var i = 0
        while (i < other.n) { add(other.arr(i).toInt); i += 1 }
      }

    def cardinality: Int =
      if (words == null) n
      else {
        var c = 0; var i = 0
        while (i < 1024) { c += java.lang.Long.bitCount(words(i)); i += 1 }
        c
      }

    /** |this ∩ other| per mode pair: bitmap×bitmap is AND+popcount,
      * array×bitmap probes the bitmap, array×array is a merge walk
      * (both arrays are sorted). */
    def intersectCount(other: Container): Long =
      if (words != null && other.words != null) {
        var c = 0L; var i = 0
        while (i < 1024) {
          c += java.lang.Long.bitCount(words(i) & other.words(i)); i += 1
        }
        c
      } else if (words == null && other.words == null) {
        val (a, an, b, bn) =
          if (n <= other.n) (arr, n, other.arr, other.n)
          else (other.arr, other.n, arr, n)
        var c = 0L; var i = 0; var j = 0
        while (i < an && j < bn) {
          if (a(i) < b(j)) i += 1
          else if (a(i) > b(j)) j += 1
          else { c += 1; i += 1; j += 1 }
        }
        c
      } else {
        val (ar, arn, bm) =
          if (words == null) (arr, n, other) else (other.arr, other.n, this)
        var c = 0L; var i = 0
        while (i < arn) {
          if (bm.contains(ar(i).toInt)) c += 1
          i += 1
        }
        c
      }

    def copy(): Container = {
      val c = new Container
      if (words != null) { c.words = words.clone(); c.arr = null }
      else { c.arr = java.util.Arrays.copyOf(arr, math.max(n, 8)); c.n = n }
      c
    }

    def payloadBytes: Int = if (words != null) 8192 else 2 * n

    /** Layout: mode byte (0 = array, 1 = bitmap), count, payload. */
    def writeTo(bb: ByteBuffer): Unit =
      if (words != null) {
        bb.put(1: Byte); bb.putInt(cardinality)
        var i = 0
        while (i < 1024) { bb.putLong(words(i)); i += 1 }
      } else {
        bb.put(0: Byte); bb.putInt(n)
        var i = 0
        while (i < n) { bb.putChar(arr(i)); i += 1 }
      }
  }

  private val ArrayCap = 4096

  def fromBytes(bytes: Array[Byte]): Int64Bitmap = {
    val bb = ByteBuffer.wrap(bytes)
    val bm = new Int64Bitmap
    val nb = bb.getInt
    var b = 0
    while (b < nb) {
      val hi = bb.getLong
      val mode = bb.get()
      val cnt = bb.getInt
      val c = new Container
      if (mode == 1) {
        c.words = new Array[Long](1024)
        c.arr = null
        var i = 0
        while (i < 1024) { c.words(i) = bb.getLong; i += 1 }
      } else {
        c.arr = new Array[Char](math.max(cnt, 8))
        var i = 0
        while (i < cnt) { c.arr(i) = bb.getChar; i += 1 }
        c.n = cnt
      }
      bm.put(hi, c)
      b += 1
    }
    bm
  }
}
