package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Declarative (built-in-only) vector math over `array<float|double>`
  * columns. These compose Spark's codegen'd higher-order functions, so
  * Catalyst keeps them inside whole-stage codegen. The `VectorExpressions`
  * kernels are the faster custom path; these are the pure-built-in
  * equivalents (used where we want a plan with zero custom nodes, and as
  * cross-checks in tests).
  *
  * All math is double: inputs are cast element-wise to double first, and
  * folds run left-to-right — matching the DuckDB oracle exactly.
  */
object VectorOps {

  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Σ (a_i − b_i)² — squared Euclidean distance (reference
    * `kdtree2.cpp:529-539` semantics, double accumulation). */
  def dist2(a: Column, b: Column): Column =
    aggregate(
      zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  def dist(a: Column, b: Column): Column = sqrt(dist2(a, b))

  /** Σ a_i·b_i */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column = dot(a, a)

  /** cos(a,b) = a·b / (‖a‖‖b‖) */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** ε-grid cell id over selected dimensions: `floor(v[d] / cellWidth)`
    * per bucketed dim, as an `array<long>` join key. With cell width = ε,
    * any two points within ε of each other land in the same or an adjacent
    * cell along every bucketed dim — the basis of the ε self-join
    * (replaces the reference's geometric partitioning + kd-tree,
    * `geometric_partitioning.cpp:243-497`, `kdtree2.cpp`). */
  def cellId(v: Column, cellWidth: Double, dims: Seq[Int]): Column =
    if (dims.isEmpty) array()
    else array(dims.map(d =>
      floor(element_at(v, d + 1).cast("double") / lit(cellWidth)).cast("long")): _*)

  /** One-row dimensionality probe of a vector column — the shared
    * idiom behind `pickBucketDims` and the ANN plane-width guards.
    * NULL rows are filtered first (`size(NULL)` = −1 under the default
    * legacy sizeOfNull, and `limit(1)`'s row choice is nondeterministic
    * — an unlucky null first row must not change the answer), and
    * streaming DataFrames return None rather than attempting an
    * illegal collect.
    * @return Some(dims) from the first non-null vector; None for an
    *   empty/all-null/streaming input. */
  def probeDim(df: org.apache.spark.sql.DataFrame,
      vecCol: String): Option[Int] =
    if (df.isStreaming) None
    else df.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol))).limit(1).collect()
      .headOption.map(_.getInt(0))
}
