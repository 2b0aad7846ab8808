package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-by-score accumulator: keeps the k (id, score) pairs with
  * the SMALLEST score (ties by id), as a size-capped binary max-heap.
  *
  * This is the reference's k-NN result heap (`kdtree2.cpp:45-65`,
  * `:574-598` — a priority queue with a shrinking ball) turned into a
  * Catalyst aggregate: `groupBy(query).agg(topk(id, d2, k))` runs as a
  * partial/final hash aggregate — each candidate row touches an O(log k)
  * heap once, and only k-sized buffers cross the shuffle. The window
  * alternative (`row_number() over (partition by query order by d2)`)
  * must shuffle and SORT every candidate pair; this aggregate replaces
  * that sort with O(n log k) heap pushes and a k-sized merge.
  *
  * Output: array<struct<id: long, score: double>> sorted ascending by
  * (score, id) — position+1 is the rank.
  */
case class TopKByScore(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Heap] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKByScore.Heap =
    new TopKByScore.Heap(k)

  override def update(buf: TopKByScore.Heap, input: InternalRow): TopKByScore.Heap = {
    val idV = idExpr.eval(input)
    val scV = scoreExpr.eval(input)
    if (idV != null && scV != null)
      buf.push(idV.asInstanceOf[Long], scV.asInstanceOf[Double])
    buf
  }

  override def merge(a: TopKByScore.Heap, b: TopKByScore.Heap): TopKByScore.Heap = {
    b.foreach((id, sc) => a.push(id, sc))
    a
  }

  override def eval(buf: TopKByScore.Heap): Any = {
    val arr = buf.sortedAsc
    new GenericArrayData(arr.map { case (id, sc) =>
      InternalRow(id, sc)
    })
  }

  override def serialize(buf: TopKByScore.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach((id, sc) => { bb.putLong(id); bb.putDouble(sc) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKByScore.Heap(k)
    var i = 0
    while (i < n) { h.push(bb.getLong, bb.getDouble); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
  override def prettyName: String = "topk_by_score"
}

object TopKByScore {
  /** Size-capped max-heap on (score, id): root = current WORST kept pair,
    * so a better candidate replaces the root in O(log k). */
  final class Heap(k: Int) {
    private val ids = new Array[Long](k)
    private val scores = new Array[Double](k)
    var size: Int = 0

    // SQL-total-order score comparison: the `+ 0.0` folds -0.0 into +0.0
    // (so ±0.0 tie and fall through to the id tie-break, like DuckDB
    // ORDER BY) while NaN + 0.0 stays NaN, which Double.compare sorts
    // LAST. Primitive >/== would make every comparison with NaN false,
    // letting a NaN candidate evict the root and corrupt the heap.
    private def scoreCmp(a: Double, b: Double): Int =
      java.lang.Double.compare(a + 0.0, b + 0.0)

    // "worse" = larger (score, id) — the heap keeps the k smallest
    private def worse(i: Int, j: Int): Boolean = {
      val c = scoreCmp(scores(i), scores(j))
      c > 0 || (c == 0 && ids(i) > ids(j))
    }
    private def worseThanRoot(id: Long, sc: Double): Boolean = {
      val c = scoreCmp(sc, scores(0))
      c > 0 || (c == 0 && id > ids(0))
    }
    private def swap(i: Int, j: Int): Unit = {
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
      val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    }

    def push(id: Long, sc: Double): Unit = {
      if (size < k) {
        ids(size) = id; scores(size) = sc; size += 1
        var c = size - 1
        while (c > 0 && worse(c, (c - 1) / 2)) { swap(c, (c - 1) / 2); c = (c - 1) / 2 }
      } else if (!worseThanRoot(id, sc)) {
        ids(0) = id; scores(0) = sc
        var p = 0
        var done = false
        while (!done) {
          val l = 2 * p + 1; val r = 2 * p + 2
          var m = p
          if (l < size && worse(l, m)) m = l
          if (r < size && worse(r, m)) m = r
          if (m == p) done = true else { swap(p, m); p = m }
        }
      }
    }

    def foreach(f: (Long, Double) => Unit): Unit = {
      var i = 0
      while (i < size) { f(ids(i), scores(i)); i += 1 }
    }

    def sortedAsc: Array[(Long, Double)] = {
      val out = new Array[(Long, Double)](size)
      var i = 0
      while (i < size) { out(i) = (ids(i), scores(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Long, Double), b: (Long, Double)) => {
          val c = scoreCmp(a._2, b._2)
          c < 0 || (c == 0 && a._1 < b._1)
        })
      out
    }
  }

  import org.apache.spark.sql.GraftInternals.{column, expression}
  /** Column API: `topkMin(id, score, k)` aggregate. */
  def topkMin(id: Column, score: Column, k: Int): Column =
    column(TopKByScore(expression(id), expression(score), k)
      .toAggregateExpression())

  /** Column API: [[TopKByScoreLong]] aggregate — exact-integer scores. */
  def topkMinLong(id: Column, score: Column, k: Int): Column =
    column(TopKByScoreLong(expression(id), expression(score), k)
      .toAggregateExpression())
}

/** [[TopKByScore]] with an exact LONG score: for integer-valued scores
  * (quantized ADC sums, scaled distances) that may exceed 2^53, where the
  * double heap's rounding could collapse distinct scores and diverge from
  * an exact-BIGINT oracle ordering. Same heap, same (score, id) tie rule;
  * output struct score field is `long`. */
case class TopKByScoreLong(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScoreLong.Heap] {

  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(idExpr, scoreExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKByScoreLong.Heap =
    new TopKByScoreLong.Heap(k)

  override def update(buf: TopKByScoreLong.Heap,
      input: InternalRow): TopKByScoreLong.Heap = {
    val idV = idExpr.eval(input)
    val scV = scoreExpr.eval(input)
    if (idV != null && scV != null)
      buf.push(idV.asInstanceOf[Long], scV.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKByScoreLong.Heap,
      b: TopKByScoreLong.Heap): TopKByScoreLong.Heap = {
    b.foreach((id, sc) => a.push(id, sc))
    a
  }

  override def eval(buf: TopKByScoreLong.Heap): Any = {
    val arr = buf.sortedAsc
    new GenericArrayData(arr.map { case (id, sc) => InternalRow(id, sc) })
  }

  override def serialize(buf: TopKByScoreLong.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach((id, sc) => { bb.putLong(id); bb.putLong(sc) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScoreLong.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKByScoreLong.Heap(k)
    var i = 0
    while (i < n) { h.push(bb.getLong, bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScoreLong =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScoreLong =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(idExpr = newChildren(0), scoreExpr = newChildren(1))
  override def prettyName: String = "topk_by_score_long"
}

object TopKByScoreLong {
  /** [[TopKByScore.Heap]] over exact long scores — no NaN/−0.0 cases, so
    * the comparator is plain Long ordering. */
  final class Heap(k: Int) {
    private val ids = new Array[Long](k)
    private val scores = new Array[Long](k)
    var size: Int = 0

    private def worse(i: Int, j: Int): Boolean =
      scores(i) > scores(j) || (scores(i) == scores(j) && ids(i) > ids(j))
    private def worseThanRoot(id: Long, sc: Long): Boolean =
      sc > scores(0) || (sc == scores(0) && id > ids(0))
    private def swap(i: Int, j: Int): Unit = {
      val ti = ids(i); ids(i) = ids(j); ids(j) = ti
      val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    }

    def push(id: Long, sc: Long): Unit = {
      if (size < k) {
        ids(size) = id; scores(size) = sc; size += 1
        var c = size - 1
        while (c > 0 && worse(c, (c - 1) / 2)) { swap(c, (c - 1) / 2); c = (c - 1) / 2 }
      } else if (!worseThanRoot(id, sc)) {
        ids(0) = id; scores(0) = sc
        var p = 0
        var done = false
        while (!done) {
          val l = 2 * p + 1; val r = 2 * p + 2
          var m = p
          if (l < size && worse(l, m)) m = l
          if (r < size && worse(r, m)) m = r
          if (m == p) done = true else { swap(p, m); p = m }
        }
      }
    }

    def foreach(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < size) { f(ids(i), scores(i)); i += 1 }
    }

    def sortedAsc: Array[(Long, Long)] = {
      val out = new Array[(Long, Long)](size)
      var i = 0
      while (i < size) { out(i) = (ids(i), scores(i)); i += 1 }
      scala.util.Sorting.stableSort(out,
        (a: (Long, Long), b: (Long, Long)) =>
          a._2 < b._2 || (a._2 == b._2 && a._1 < b._1))
      out
    }
  }
}
