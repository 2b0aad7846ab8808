package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass PCA over an embedding column — the dimensionality-reduction
  * step of an embedding pipeline (dedup/ANN preprocessing, whitening,
  * drift monitoring), shaped for corpus scale:
  *
  *  - the second-moment statistics are ONE [[CovMoments]] aggregate
  *    (buffer = n, d first-moment sums, d(d+1)/2 product sums — a few
  *    KB), with map-side partial merge; the corpus is read once and
  *    never shuffled (only the tiny buffers move). No per-row (i, j)
  *    explode — a d² row blowup is exactly what a 100 TB scan cannot
  *    afford.
  *  - the top principal component comes from driver-side power
  *    iteration on the d×d matrix (collecting d(d+3)/2 + 1 longs — the
  *    IVF-centroid/naive-Bayes "model fits the driver by construction"
  *    precedent), with FIXED iteration count and index-ordered folds so
  *    the result is bit-deterministic.
  *
  * Numerics for the cross-engine oracle (q200): every element and
  * product is float→double widened then quantized HALF_UP to 2⁻²⁰
  * units, so the moment sums are exact integers in ANY engine and any
  * partitioning/fold order; the covariance closes over them in one
  * fixed-order double expression. Quantizing the PRODUCT (not the
  * operands) keeps magnitudes ~|x|²·2²⁰ — safe in a long out to ~10¹²
  * rows — at the price of a deterministic ~2⁻²¹ per-row rounding that
  * survives averaging as a ≲1e-6 bias on covariance entries (documented
  * contract; raise `Shift` if tighter is ever needed).
  */
object Pca {

  /** Quantization shift: products land in units of 2^-Shift. */
  val Shift = 20
  val Scale: Double = (1L << Shift).toDouble

  /** Moment sums of the FIRST `d` vector entries as array<long>:
    * [1] = n, [2 .. d+1] = Σ q(x_i), then for i ≤ j in row-major pair
    * order Σ q(x_i · x_j), with q(v) = round(v · 2^Shift) HALF_UP
    * (1-based positions as `element_at` sees them). */
  def moments(vec: Column, d: Int): Column = {
    import org.apache.spark.sql.GraftInternals.{column, expression}
    column(CovMoments(expression(vec), d).toAggregateExpression())
  }

  /** Covariance matrix entries of the first `d` dims, one row per
    * ordered pair i ≤ j (0-based), from ONE pass over `emb`:
    * cov = E[x_i x_j] − E[x_i]E[x_j] over the quantized values.
    * @return (i, j, cov) with cov rounded to `scale` decimals. */
  def covariance(emb: DataFrame, vecCol: String, d: Int,
      scale: Int = 9): DataFrame = {
    require(d >= 1, s"d must be >= 1, got $d")
    val m = emb.agg(moments(col(vecCol), d).as("m"))
    // explode only the (i, j, pos) INDEX structs and compute the
    // covariance expression once per exploded row — inlining the full
    // arithmetic into all d(d+1)/2 array elements put ~136 copies of it
    // in one generated method, tripping Janino's 64 KB limit at d=16
    // (harmless on this one-row table, but the fallback re-compiles and
    // stack-traces on every run)
    val pairs = for (i <- 0 until d; j <- i until d) yield
      struct(lit(i).as("i"), lit(j).as("j"),
        lit(pairPos(i, j, d)).as("pos"))
    val n = element_at(col("m"), 1).cast("double")
    val sij = element_at(col("m"), col("p.pos") + lit(d + 2))
    val si = element_at(col("m"), col("p.i") + lit(2))
    val sj = element_at(col("m"), col("p.j") + lit(2))
    m.select(col("m"), explode(array(pairs: _*)).as("p"))
      .select(col("p.i").as("i"), col("p.j").as("j"),
        round(sij.cast("double") / n / lit(Scale) -
          (si.cast("double") / n / lit(Scale)) *
            (sj.cast("double") / n / lit(Scale)), scale).as("cov"))
  }

  /** 0-based offset of pair (i ≤ j) in the row-major upper-triangle
    * layout. */
  private def pairPos(i: Int, j: Int, d: Int): Int =
    i * d - i * (i - 1) / 2 + (j - i)

  /** Top principal component by fixed-count power iteration on the
    * covariance matrix of the first `d` dims (driver-side d×d solve on
    * the collected moment buffer). Deterministic: v₀ = 1/√d, every
    * matvec and norm folds in index order, no convergence early-exit.
    * @return (eigenvalue, eigenvector of length d). */
  def topComponent(emb: DataFrame, vecCol: String, d: Int,
      iters: Int = 50): (Double, Array[Double]) =
    topComponents(emb, vecCol, d, k = 1, iters = iters).head

  /** Top `k` principal components by power iteration with Hotelling
    * deflation (C ← C − λ v vᵀ after each recovered component) on the
    * same single-pass moment buffer as [[topComponent]] — ONE corpus
    * read for any k. Deterministic for the same reasons; components
    * come back eigenvalue-descending, each with the leading-coordinate
    * sign convention. Accuracy degrades for near-equal eigenvalues
    * (power iteration's usual limit) — fine for the dominant-direction
    * uses this serves (whitening, drift axes, visualization).
    * @return (eigenvalue, component) pairs, length k. */
  def topComponents(emb: DataFrame, vecCol: String, d: Int, k: Int,
      iters: Int = 100): Seq[(Double, Array[Double])] = {
    require(k >= 1 && k <= d, s"need 1 <= k <= d, got k=$k d=$d")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val buf = emb.agg(moments(col(vecCol), d).as("m"))
      .head.getSeq[Long](0).toArray
    val n = buf(0).toDouble
    require(n > 0, "empty input")
    val cov = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val c = buf(1 + d + pairPos(i, j, d)).toDouble / n / Scale -
        (buf(1 + i).toDouble / n / Scale) *
          (buf(1 + j).toDouble / n / Scale)
      cov(i)(j) = c
      cov(j)(i) = c
    }
    (0 until k).map { _ =>
      val (lambda, v) = powerIterate(cov, iters)
      // deflate: C -= lambda * v v^T
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { cov(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      (lambda, v)
    }
  }

  /** Fixed-count power iteration on a dense symmetric matrix (index-
    * ordered folds, 1/√d init, leading-coordinate sign fix). A zero (or
    * exactly-deflated) matrix maps the start vector to zero — that is a
    * valid degenerate input (all-identical vectors after dedup, a single
    * row, k = rank): return eigenvalue 0 with the start direction rather
    * than aborting the job. */
  private def powerIterate(cov: Array[Array[Double]],
      iters: Int): (Double, Array[Double]) = {
    val d = cov.length
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += cov(i)(j) * v(j); j += 1 }
        w(i) = s
        i += 1
      }
      var nrm2 = 0.0
      var q = 0
      while (q < d) { nrm2 += w(q) * w(q); q += 1 }
      val nrm = math.sqrt(nrm2)
      if (nrm == 0) { lambda = 0.0; it = iters } // degenerate: keep v
      else {
        var m = 0
        while (m < d) { w(m) = w(m) / nrm; m += 1 }
        lambda = nrm
        v = w
        it += 1
      }
    }
    val lead = v.indexWhere(_ != 0.0)
    if (lead >= 0 && v(lead) < 0) {
      var i = 0
      while (i < v.length) { v(i) = -v(i); i += 1 }
    }
    (lambda, v)
  }

  /** Projection of each row's first-`d` slice onto `component` (an
    * index-ordered codegen'd fold — the literal-vector shape of the
    * IVF probes). @return (idCol, proj). */
  def project(emb: DataFrame, idCol: String, vecCol: String,
      component: Array[Double], scale: Int = 6): DataFrame = {
    val dot = component.zipWithIndex.map { case (c, i) =>
      element_at(col(vecCol), i + 1).cast("double") * lit(c)
    }.reduceLeft(_ + _)
    emb.select(col(idCol), round(dot, scale).as("proj"))
  }
}

/** The one-pass moment aggregate behind [[Pca]]: long buffer
  * [n, Σq(x_0)…Σq(x_{d-1}), Σq(x_i·x_j) for i ≤ j row-major], with
  * q(v) = round(v·2^Shift) HALF_UP on the float→double widened value —
  * the [[graft.functions.MinHashSignature]] pattern (typed buffer, no
  * k-wide codegen, partial-merge friendly). */
case class CovMoments(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(d >= 1, "d must be >= 1")
  private val len = 1 + d + d * (d + 1) / 2

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cov_moments needs array<float|double>, got ${other.catalogString}")
    }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  private def q(v: Double): Long =
    java.math.BigDecimal.valueOf(v * Pca.Scale)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      require(arr.numElements() >= d,
        s"cov_moments: row has ${arr.numElements()} dims, need >= $d")
      val x = new Array[Double](d)
      var i = 0
      while (i < d) {
        x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      buf(0) += 1
      i = 0
      var p = 1 + d
      while (i < d) {
        buf(1 + i) += q(x(i))
        var j = i
        while (j < d) {
          buf(p) += q(x(i) * x(j))
          p += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(l => l: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(len * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(len)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): CovMoments =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CovMoments =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "cov_moments"
}
