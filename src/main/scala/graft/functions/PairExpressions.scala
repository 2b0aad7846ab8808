package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All ordered pairs (ids(i), ids(j)), i < j, from one posting list —
  * the candidate-pair kernel of the inverted-index similarity joins
  * ([[graft.operators.Dedup]]).
  *
  * The declarative twin — `flatten(transform(ids, (x,i) ->
  * transform(slice(ids, i+2, ...), y -> struct(x, y))))` — allocates a
  * nested array per element and runs on interpreted lambdas (Spark's
  * higher-order functions never enter whole-stage codegen), which made
  * pair generation the hottest stage of the Jaccard join. One flat Scala
  * loop over a primitive array does the same work allocation-free except
  * for the output itself.
  *
  * Input MUST be sorted ascending if downstream relies on a_id < b_id
  * (the Dedup callers sort in the upstream collect_list aggregation).
  */
case class PostingPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"posting_pairs needs array<bigint>, got ${other.catalogString}")
    }
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a_id", LongType, nullable = false),
      StructField("b_id", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val ids = input.asInstanceOf[ArrayData].toLongArray()
    val n = ids.length
    PairExpressions.checkArrayPostingLength(n)
    // Long math: n*(n-1) wraps Int already at n = 46342, well inside the
    // guard's limit (the quotient always fits once computed in Long)
    val out = new Array[Any]((n.toLong * (n - 1) / 2).toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val a = ids(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, ids(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "posting_pairs"
}

/** Size-aware pair generation with the AllPairs LENGTH FILTER fused in:
  * input is one posting list of `struct(id, sz)` (sz = the doc's distinct
  * shingle count, attached before the explode so no size join is ever
  * needed); output pairs carry both sizes and are emitted only when
  * `min(sz) ≥ t·max(sz)` — a necessary condition for Jaccard ≥ t
  * (inter ≤ min; jac ≥ t ⟺ inter ≥ t(sa+sb)/(1+t), feasible only if
  * (1+t)·min ≥ t·(min+max)). Lossless, and it prunes before the pair
  * shuffle, where pruning is cheapest.
  */
case class PostingPairsWithSize(child: Expression, minJaccard: Double)
    extends UnaryExpression with CodegenFallback {
  require(minJaccard >= 0.0 && minJaccard <= 1.0)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StructType(
        Array(StructField(_, LongType, _, _), StructField(_, LongType, _, _))), _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"posting_pairs_sz needs array<struct<bigint,bigint>>, got ${other.catalogString}")
    }
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a_id", LongType, nullable = false),
      StructField("b_id", LongType, nullable = false),
      StructField("a_sz", LongType, nullable = false),
      StructField("b_sz", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    PairExpressions.checkArrayPostingLength(n)
    val ids = new Array[Long](n)
    val szs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getStruct(i, 2)
      ids(i) = s.getLong(0)
      szs(i) = s.getLong(1)
      i += 1
    }
    val buf = new scala.collection.mutable.ArrayBuffer[Any](
      math.min(n.toLong * (n - 1) / 2, 1 << 20).toInt)
    i = 0
    while (i < n) {
      val a = ids(i); val asz = szs(i)
      var j = i + 1
      while (j < n) {
        val bsz = szs(j)
        val mn = math.min(asz, bsz); val mx = math.max(asz, bsz)
        // feasibility = best-case jaccard (one set contained in the other:
        // inter = mn, union = mx) clears the threshold, compared EXACTLY
        // like the final `jac >= t` filter (double division, not mn >=
        // t*mx, whose rounding can differ at the boundary and silently
        // drop jac == t pairs — division is correctly rounded and
        // monotone, so this is lossless)
        if (mn.toDouble / mx >= minJaccard) {
          buf += new GenericInternalRow(Array[Any](a, ids(j), asz, bsz))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "posting_pairs_sz"
}

/** GENERATOR form of [[PostingPairs]]: emits the i<j pairs lazily, one
  * row at a time, like `explode` — the pair set is never materialized as
  * an array. This is the form the Dedup operators use: a posting row with
  * df ids streams df·(df−1)/2 output rows in O(1) memory, where
  * `explode(posting_pairs(ids))` would first build the whole quadratic
  * array inside the row (an executor-OOM hazard for stopword-grade keys).
  */
case class ExplodePostingPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"explode_posting_pairs needs array<bigint>, got ${other.catalogString}")
    }
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val ids = v.asInstanceOf[ArrayData].toLongArray()
    val n = ids.length
    PairExpressions.checkPostingLength(n)
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < n - 1
      override def next(): InternalRow = {
        val r = new GenericInternalRow(Array[Any](ids(i), ids(j)))
        j += 1
        if (j >= n) { i += 1; j = i + 1 }
        r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "explode_posting_pairs"
}

/** Generator form of [[PostingPairsWithSize]]: lazy size-carrying pairs
  * with the AllPairs length filter fused in. See [[ExplodePostingPairs]]
  * for why a generator (O(1) memory per posting row) and
  * [[PostingPairsWithSize]] for the filter's losslessness argument. */
case class ExplodePostingPairsWithSize(child: Expression, minJaccard: Double)
    extends UnaryExpression with Generator with CodegenFallback {
  require(minJaccard >= 0.0 && minJaccard <= 1.0)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StructType(
        Array(StructField(_, LongType, _, _), StructField(_, LongType, _, _))), _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "explode_posting_pairs_sz needs array<struct<bigint,bigint>>, " +
            s"got ${other.catalogString}")
    }
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false),
    StructField("a_sz", LongType, nullable = false),
    StructField("b_sz", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    PairExpressions.checkPostingLength(n)
    val ids = new Array[Long](n)
    val szs = new Array[Long](n)
    var p = 0
    while (p < n) {
      val s = arr.getStruct(p, 2)
      ids(p) = s.getLong(0)
      szs(p) = s.getLong(1)
      p += 1
    }
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      private var ready: InternalRow = _
      private def advance(): Unit = {
        while (ready == null && i < n - 1) {
          val mn = math.min(szs(i), szs(j)); val mx = math.max(szs(i), szs(j))
          if (mn.toDouble / mx >= minJaccard) {
            ready = new GenericInternalRow(
              Array[Any](ids(i), ids(j), szs(i), szs(j)))
          }
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
        }
      }
      override def hasNext: Boolean = { advance(); ready != null }
      override def next(): InternalRow = {
        advance(); val r = ready; ready = null; r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "explode_posting_pairs_sz"
}

object PairExpressions {
  import org.apache.spark.sql.GraftInternals.{column, expression}

  /** Longest posting list the STREAMING pair kernels (the generator
    * forms) accept: beyond this, the i<j pair count overflows Int (and
    * even lazily, >2 billion rows from ONE posting means a stopword-class
    * key slipped into the index — cap it upstream with `maxDocFreq` in
    * [[graft.operators.Dedup.jaccardJoin]] instead of streaming df²
    * pairs). */
  val maxPostingLength: Int = 65536

  /** Longest posting list the ARRAY-form kernels (`posting_pairs`,
    * `posting_pairs_sz` — SQL-registered, user-callable) accept. Far
    * tighter than [[maxPostingLength]]: the array form materializes all
    * n·(n−1)/2 pair structs inside a single row, so the binding
    * constraint is the one-row allocation (~100 B/boxed pair ⇒ 65536 ids
    * would attempt a multi-GB array — executor OOM), not Int overflow.
    * 1024 ids ⇒ ≤523776 pairs ≈ tens of MB, the most a sane single row
    * should hold; longer lists belong to the O(1)-memory generators. */
  val maxArrayPostingLength: Int = 1024

  private[functions] def checkPostingLength(n: Int): Unit =
    if (n > maxPostingLength) throw new IllegalStateException(
      s"posting list of $n ids would generate ${n.toLong * (n - 1) / 2} " +
        s"pairs (limit $maxPostingLength ids) — drop ultra-frequent keys " +
        "upstream, e.g. with jaccardJoin's maxDocFreq")

  private[functions] def checkArrayPostingLength(n: Int): Unit =
    if (n > maxArrayPostingLength) throw new IllegalStateException(
      s"posting list of $n ids would materialize ${n.toLong * (n - 1) / 2} " +
        s"pair structs in ONE row (array-form limit $maxArrayPostingLength " +
        "ids) — use the explode_posting_pairs* generators for long lists, " +
        "or drop ultra-frequent keys upstream (jaccardJoin's maxDocFreq)")

  /** `posting_pairs(ids)`: array<struct<a_id,b_id>> of all i<j pairs. */
  def postingPairs(ids: Column): Column = column(PostingPairs(expression(ids)))

  /** `posting_pairs_sz(ids, t)`: length-filtered size-carrying pairs. */
  def postingPairsWithSize(ids: Column, minJaccard: Double): Column =
    column(PostingPairsWithSize(expression(ids), minJaccard))

  /** Lazy generator of i<j pairs — use instead of
    * `explode(postingPairs(...))` (O(1) memory per posting row). */
  def explodePostingPairs(ids: Column): Column =
    column(ExplodePostingPairs(expression(ids)))

  /** Lazy generator of length-filtered size-carrying pairs. */
  def explodePostingPairsWithSize(ids: Column, minJaccard: Double): Column =
    column(ExplodePostingPairsWithSize(expression(ids), minJaccard))
}
