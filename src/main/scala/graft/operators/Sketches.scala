package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (HyperLogLog, via Spark's built-in
  * Apache DataSketches integration) — the approximate path for
  * "distinct X per Y" at 100 TB, where an exact countDistinct's expand +
  * two-phase shuffle moves every distinct value.
  *
  * The pattern these wrappers encode is sketch-once / re-aggregate-many:
  * build fine-grained sketches (per partition-unit: day, source,
  * shard), persist the few-KB binaries, then answer ANY coarser rollup
  * by unioning sketches — no rescan of the corpus. HLL union merges
  * register maxima losslessly, so a merged estimate tracks the
  * direct coarse-level sketch to well under the error envelope
  * (spec-enforced; not bit-equal — DataSketches' HIP estimator on a
  * directly-built sketch is insertion-order dependent and a union
  * falls back to the composite estimator), and accuracy is a fixed
  * ~1.04/√2^lgK (≈1.6% at lgK=12) regardless of cardinality.
  *
  * The exact twins stay first-class: q48 answers the same question with
  * countDistinct and remains the DuckDB-oracled correctness anchor.
  */
object Sketches {

  /** Per-group HLL sketch of `valueCol`'s distinct values.
    * @param lgK log2 of the register count (12 ⇒ ~1.6% rel. std. error,
    *   4 KiB per sketch). */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))
  }

  /** Re-aggregate sketches to a coarser grouping (sketch union). */
  def mergeSketches(df: DataFrame, groupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col(sketchCol)).as("sketch"))

  /** Distinct-count estimate of a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)
}
