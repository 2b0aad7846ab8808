package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** k-function MinHash signature as ONE aggregate: buffer = k running
  * minima of `xxhash64(value, seed=i)` for i in 0..k-1.
  *
  * Equivalent to `agg(min(xxhash64(col, 0)), …, min(xxhash64(col, k-1)))`
  * — literally the same `XxHash64Function` per element — but as a single
  * `TypedImperativeAggregate` with a k-long binary buffer instead of k
  * separate aggregate columns. At k=64+ the column-list formulation pays a
  * multi-second whole-stage-codegen compile per plan and carries k agg
  * buffer slots through the shuffle; this pays neither.
  *
  * Output: array<long> of length k (position i = min over seed i).
  */
case class MinHashSignature(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(k >= 1, "k must be >= 1")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        // fail at analysis, not as a ClassCastException mid-shuffle
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash needs a string or long column, got ${other.catalogString}")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  // LongType input (the hash-first scheme: elements are already 64-bit
  // shingle fingerprints) re-hashes a FIXED 8 bytes per seed — ~25x
  // cheaper than re-hashing a ~25-byte shingle string k times, which is
  // what makes minhash affordable as a 100 TB map-side kernel. The
  // min-wise quality is unchanged (k independent functions over the
  // 64-bit fingerprint universe; a 64-bit collision merges two shingles
  // with probability ~n²/2⁶⁵ — absorbed by the exact verify).
  // lazy: the constructor also runs on UNRESOLVED children (copy() during
  // tree transforms), where dataType would throw
  private lazy val isLong = child.dataType == LongType

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      var i = 0
      if (isLong) {
        val l = v.asInstanceOf[Long]
        while (i < k) {
          val h = XxHash64Function.hash(l, LongType, i.toLong)
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      } else {
        val s = v.asInstanceOf[UTF8String]
        while (i < k) {
          val h = XxHash64Function.hash(s, StringType, i.toLong)
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(l => l: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSignature =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSignature =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "minhash_signature"
}

object MinHashAgg {
  import org.apache.spark.sql.GraftInternals.{column, expression}
  /** `minhash(stringCol, k)` — array<long> signature aggregate. */
  def minhash(value: Column, k: Int): Column =
    column(MinHashSignature(expression(value), k).toAggregateExpression())
}
