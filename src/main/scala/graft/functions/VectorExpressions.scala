package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst kernels for the hot path of the ε-neighborhood self-join.
  *
  * The reference engine's innermost loop is a squared-L2 distance
  * accumulation over float32 coordinates (reference `kdtree2.cpp:12-14`,
  * `:529-539`, `:620-630`). Re-expressed here as a codegen'd binary
  * expression over `array<float>` / `array<double>` columns so it stays
  * inside whole-stage codegen (no UDF boxing) — at 100 TB this expression
  * is evaluated per candidate pair, so it must compile to a tight JIT'd
  * loop, which `doGenCode` below guarantees.
  *
  * Numerics: each element is widened to double before subtraction and the
  * accumulation is a left-to-right double fold — this exactly matches the
  * DuckDB oracle formula `list_sum(list_transform(list_zip(a::DOUBLE[],
  * b::DOUBLE[]), x -> (x[1]-x[2])*(x[1]-x[2])))`, making threshold
  * comparisons bit-identical between engine and oracle.
  */
abstract class VectorFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  /** Java source for the per-element update of accumulator `acc` given
    * element values `xv` and `yv` (already widened to double). */
  protected def elementUpdate(acc: String, xv: String, yv: String): String
  /** Scala-side per-element update for interpreted eval. */
  protected def update(acc: Double, x: Double, y: Double): Double

  protected def elemDouble(arr: ArrayData, et: DataType, i: Int): Double =
    et match {
      case org.apache.spark.sql.types.FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

  protected def leftElemType: DataType =
    left.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
  protected def rightElemType: DataType =
    right.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val let = leftElemType
    val ret = rightElemType
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc = update(acc, elemDouble(x, let, i), elemDouble(y, ret, i))
      i += 1
    }
    acc
  }

  protected def getJava(et: DataType, arr: String, i: String): String = et match {
    case org.apache.spark.sql.types.FloatType => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${getJava(leftElemType, x, i)};
         |  double $yv = ${getJava(rightElemType, y, i)};
         |  ${elementUpdate(acc, xv, yv)}
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}

/** Squared Euclidean distance between two float/double vectors
  * (reference `kdtree2.cpp:529-539`; we accumulate in double — more
  * accurate). When the distance is only compared against a radius, use
  * [[WithinEps]] instead — it early-exits the fold like the reference. */
case class SquaredL2(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override protected def elementUpdate(acc: String, xv: String, yv: String) =
    s"$acc += ($xv - $yv) * ($xv - $yv);"
  override protected def update(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "squared_l2"
}

/** Dot product between two float/double vectors — the kernel of cosine
  * similarity for ANN / embedding near-dup. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorFoldExpression {
  override protected def elementUpdate(acc: String, xv: String, yv: String) =
    s"$acc += $xv * $yv;"
  override protected def update(acc: Double, x: Double, y: Double): Double =
    acc + x * y
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_product"
}

/** Ball-membership predicate `‖a − b‖² ≤ eps2` with the reference's
  * early-exit (`kdtree2.cpp:620-630`), BLOCKED: the fold runs in
  * branchless 16-element blocks (the JIT unrolls a fixed-trip inner loop;
  * a per-element exit branch measurably de-optimizes it) and the radius
  * check happens at block boundaries. Exiting is sound at any prefix —
  * every remaining term is non-negative, so a partial sum above `eps2`
  * means the full sum is too. The accumulation order is the identical
  * left-to-right double fold, so the boolean is EXACTLY
  * `squared_l2(a, b) <= eps2` (NaN partials never exit early — `> eps2`
  * is false for NaN — and end false, same as the full fold). Far pairs
  * cost O(16) instead of O(dim); near pairs pay one extra compare per 16
  * elements. Per-candidate-pair hot path at 100 TB; `eps2` is a plan-time
  * constant baked into the generated loop. */
case class WithinEps(left: Expression, right: Expression, eps2: Double)
    extends VectorFoldExpression {
  // eps2 is spliced into generated Java source as a literal — NaN/Infinity
  // have no Java literal form (and a NaN radius is meaningless anyway)
  require(java.lang.Double.isFinite(eps2), s"eps2 must be finite, got $eps2")

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  /** `eps2` as a Java double literal (the plain toString of a finite double
    * is valid Java, incl. scientific notation; `D` suffix for clarity). */
  private def eps2Lit: String = s"${eps2}D"

  // unused abstract hooks (this node generates its own blocked loop)
  override protected def elementUpdate(acc: String, xv: String, yv: String) =
    s"$acc += ($xv - $yv) * ($xv - $yv);"
  override protected def update(acc: Double, x: Double, y: Double): Double = {
    val d = x - y; acc + d * d
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val let = leftElemType
    val ret = rightElemType
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n && !(acc > eps2)) {
      val e = math.min(i + 16, n)
      while (i < e) {
        acc = update(acc, elemDouble(x, let, i), elemDouble(y, ret, i))
        i += 1
      }
    }
    acc <= eps2
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val e = ctx.freshName("e")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |int $i = 0;
         |while ($i < $n && !($acc > $eps2Lit)) {
         |  int $e = java.lang.Math.min($i + 16, $n);
         |  for (; $i < $e; $i++) {
         |    double $xv = ${getJava(leftElemType, x, i)};
         |    double $yv = ${getJava(rightElemType, y, i)};
         |    $acc += ($xv - $yv) * ($xv - $yv);
         |  }
         |}
         |${ev.value} = $acc <= $eps2Lit;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "within_eps"
}

/** Argmin-centroid assignment `vec → c_id` over a plan-time centroid
  * matrix, as ONE codegen'd loop. Semantically identical to
  * `least(struct(squared_l2(vec, c_1), id_1), …).c_id` — d2 is the same
  * left-to-right double fold with the same float→double widening, the
  * centroids are scanned in ascending-id order and only a STRICT
  * improvement replaces the running best, so ties resolve to the smallest
  * centroid id (= the lexicographic `(d2, c_id)` struct min). The literal
  * form generates O(nCentroids · dims) Java source (64 centroids × 32 dims
  * measured ~150 µs/row — Janino-hostile, falls out of JIT); this kernel is
  * O(1) source referencing the matrix as a `double[][]`, ~µs/row at any
  * centroid count. Per-build-vector hot path of the IVF index at 100 TB. */
case class NearestCentroidId(child: Expression,
    cents: Array[Array[Double]], ids: Array[Int])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(cents.nonEmpty && cents.length == ids.length,
    "centroid matrix and id array must be non-empty and aligned")
  require(ids.toSeq == ids.toSeq.sorted && ids.distinct.length == ids.length,
    "centroid ids must be strictly ascending (tie rule depends on scan order)")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = child.nullable

  private def elemType: DataType =
    child.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val isFloat = elemType == org.apache.spark.sql.types.FloatType
    var best = Double.PositiveInfinity
    var bestId = ids(0)
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val n = math.min(x.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val d = xv - cv(i)
        acc += d * d
        i += 1
      }
      if (acc < best) { best = acc; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val idsRef = ctx.addReferenceObj("cids", ids, "int[]")
    val getElem = elemType match {
      case org.apache.spark.sql.types.FloatType =>
        (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, x => {
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |double $best = Double.POSITIVE_INFINITY;
         |int $bestId = $idsRef[0];
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $cv = $centsRef[$c];
         |  int $n = java.lang.Math.min($x.numElements(), $cv.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $d = ${getElem(x, i)} - $cv[$i];
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $best) { $best = $acc; $bestId = $idsRef[$c]; }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroid_id"
}

/** Per-vector symmetric int8 quantization report, as ONE row-local pass:
  * `[n_dims, sum_q, sum_absq, err_q12]` (array<long>) where
  *
  *   scale = max_i |v_i| / 127
  *   q_i   = clamp(floor(v_i/scale + 0.5), −127, 127)
  *   err_q12 = Σ_i floor((v_i − q_i·scale)² · 1e12 + 0.5)
  *
  * The half-up rule is DEFINED as `floor(x + 0.5)` — explicit arithmetic
  * both engines compute identically on identical doubles, rather than
  * relying on engine `round()` semantics agreeing at the half boundary
  * (the q149 floor-division discipline). Every emitted quantity is an
  * exact integer, so the aggregate sums are fold-order-free and the
  * DuckDB oracle can reproduce them via explode + integer sums. An
  * all-zero vector quantizes to all-zero codes (scale would be 0 — the
  * division is skipped, not guarded downstream). A null element nulls the
  * whole result (quantizing a partial vector silently would corrupt the
  * codes).
  *
  * This is the bandwidth-reduction cousin of PQ: 4 bytes/dim → 1, error
  * inspectable per vector. Pure projection — no shuffle, no join, the
  * only shape that survives a 100 TB embedding store. */
case class Int8QuantStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType |
            org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        // fail at analysis, not as a ClassCastException mid-shuffle
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_quant_stats needs array<float|double>, got ${other.catalogString}")
    }

  private def elemType: DataType =
    child.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val isFloat = elemType == org.apache.spark.sql.types.FloatType
    val n = x.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val av = math.abs(v)
      if (av > amax) amax = av
      i += 1
    }
    var sq = 0L; var sa = 0L; var se = 0L
    if (amax > 0.0) {
      val scale = amax / 127.0
      i = 0
      while (i < n) {
        val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        var q = math.floor(v / scale + 0.5).toLong
        if (q > 127L) q = 127L
        if (q < -127L) q = -127L
        val d = v - q * scale
        se += math.floor(d * d * 1.0e12 + 0.5).toLong
        sq += q
        sa += math.abs(q)
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Long](n.toLong, sq, sa, se))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getElem = elemType match {
      case org.apache.spark.sql.types.FloatType =>
        (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val amax = ctx.freshName("amax"); val v = ctx.freshName("v")
      val av = ctx.freshName("av"); val scale = ctx.freshName("scale")
      val q = ctx.freshName("q"); val d = ctx.freshName("d")
      val sq = ctx.freshName("sq"); val sa = ctx.freshName("sa")
      val se = ctx.freshName("se")
      s"""
         |int $n = $x.numElements();
         |double $amax = 0.0;
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = ${getElem(x, i)};
         |  double $av = java.lang.Math.abs($v);
         |  if ($av > $amax) $amax = $av;
         |}
         |long $sq = 0L; long $sa = 0L; long $se = 0L;
         |if (!${ev.isNull} && $amax > 0.0) {
         |  double $scale = $amax / 127.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = ${getElem(x, i)};
         |    long $q = (long) java.lang.Math.floor($v / $scale + 0.5);
         |    if ($q > 127L) $q = 127L;
         |    if ($q < -127L) $q = -127L;
         |    double $d = $v - $q * $scale;
         |    $se += (long) java.lang.Math.floor($d * $d * 1.0E12 + 0.5);
         |    $sq += $q;
         |    $sa += java.lang.Math.abs($q);
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    new long[]{(long) $n, $sq, $sa, $se});
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "int8_quant_stats"
}

/** The `n` nearest centroid ids as a row-local projection — the top-N
  * generalization of [[NearestCentroidId]] that the IVF-sharded k-NN
  * graph build ([[graft.operators.AnnSearch.knnGraphIvf]]) assigns
  * build vectors with: each vector lands in its `n` closest coarse
  * cells, so true neighbors that straddle a cell boundary still share
  * at least one cell. Same exact d² fold and tie rule as
  * [[NearestCentroidId]] (strict `<` on a scan in ascending-id order ⇒
  * ties keep the smaller centroid id), so the emitted list equals the
  * oracle's `row_number() OVER (ORDER BY d2, cid) <= n`. Output is
  * ordered nearest-first; O(nCents·(dims + n)) per row, codegen'd —
  * the |B|-row assignment pass never allocates beyond the fixed-size
  * insertion buffers. */
case class TopNCentroidIds(child: Expression,
    cents: Array[Array[Double]], ids: Array[Int], n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(cents.nonEmpty && cents.length == ids.length,
    "centroid matrix and id array must be non-empty and aligned")
  require(ids.toSeq == ids.toSeq.sorted && ids.distinct.length == ids.length,
    "centroid ids must be strictly ascending (tie rule depends on scan order)")
  require(n >= 1, s"need n >= 1 top cells, got $n")

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  private def elemType: DataType =
    child.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType

  private def keep: Int = math.min(n, cents.length)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val isFloat = elemType == org.apache.spark.sql.types.FloatType
    val m = keep
    val bestD = Array.fill(m)(Double.PositiveInfinity)
    val bestId = new Array[Int](m)
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      val nd = math.min(x.numElements(), cv.length)
      var acc = 0.0
      var i = 0
      while (i < nd) {
        val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val d = xv - cv(i)
        acc += d * d
        i += 1
      }
      // strict < : an equal-distance later (larger) id never displaces
      var pos = m
      while (pos > 0 && acc < bestD(pos - 1)) pos -= 1
      if (pos < m) {
        var j = m - 1
        while (j > pos) { bestD(j) = bestD(j - 1); bestId(j) = bestId(j - 1); j -= 1 }
        bestD(pos) = acc
        bestId(pos) = ids(c)
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(bestId)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val idsRef = ctx.addReferenceObj("cids", ids, "int[]")
    val getElem = elemType match {
      case org.apache.spark.sql.types.FloatType =>
        (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    val m = keep
    nullSafeCodeGen(ctx, ev, x => {
      val bestD = ctx.freshName("bestD")
      val bestId = ctx.freshName("bestId")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val nd = ctx.freshName("nd")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val pos = ctx.freshName("pos")
      val j = ctx.freshName("j")
      s"""
         |double[] $bestD = new double[$m];
         |int[] $bestId = new int[$m];
         |java.util.Arrays.fill($bestD, Double.POSITIVE_INFINITY);
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $cv = $centsRef[$c];
         |  int $nd = java.lang.Math.min($x.numElements(), $cv.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $nd; $i++) {
         |    double $d = ${getElem(x, i)} - $cv[$i];
         |    $acc += $d * $d;
         |  }
         |  int $pos = $m;
         |  while ($pos > 0 && $acc < $bestD[$pos - 1]) $pos--;
         |  if ($pos < $m) {
         |    for (int $j = $m - 1; $j > $pos; $j--) {
         |      $bestD[$j] = $bestD[$j - 1];
         |      $bestId[$j] = $bestId[$j - 1];
         |    }
         |    $bestD[$pos] = $acc;
         |    $bestId[$pos] = $idsRef[$c];
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($bestId);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "top_n_centroid_ids"
}

object VectorExpressions {
  import org.apache.spark.sql.GraftInternals.{column, expression}
  /** Column API for the codegen'd kernels. */
  def squaredL2(a: Column, b: Column): Column =
    column(SquaredL2(expression(a), expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  /** `‖a − b‖² ≤ eps2`, early-exit — equivalent to
    * `squaredL2(a, b) <= eps2` (see [[WithinEps]]). */
  def withinEps(a: Column, b: Column, eps2: Double): Column =
    column(WithinEps(expression(a), expression(b), eps2))
  /** Argmin-centroid id over a plan-time matrix (see [[NearestCentroidId]]);
    * `cents` as (id, coords) pairs sorted ascending by id. */
  def nearestCentroidId(vec: Column, cents: Array[(Int, Array[Double])]): Column =
    column(NearestCentroidId(expression(vec), cents.map(_._2), cents.map(_._1)))
  /** The `n` nearest centroid ids, nearest first (see [[TopNCentroidIds]]);
    * `cents` as (id, coords) pairs sorted ascending by id. */
  def topNCentroidIds(vec: Column, cents: Array[(Int, Array[Double])],
      n: Int): Column =
    column(TopNCentroidIds(expression(vec), cents.map(_._2), cents.map(_._1), n))
  /** `[n_dims, sum_q, sum_absq, err_q12]` int8-quantization report
    * (see [[Int8QuantStats]]). */
  def int8QuantStats(vec: Column): Column =
    column(Int8QuantStats(expression(vec)))
}
