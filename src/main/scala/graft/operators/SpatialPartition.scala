package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial repartitioning (op GP-1) — the reference's recursive
  * median-split partitioner (`geometric_partitioning.cpp:243-497`: log₂ P
  * rounds of widest-dimension median exchanges until each rank owns an
  * axis-aligned box) re-expressed with Catalyst primitives.
  *
  * Spark-first equivalence: `repartitionByRange` on a spatial sort key IS
  * the median-split — Spark samples the key distribution (reservoir
  * sampling per partition ≈ the reference's median-of-medians) and assigns
  * equal-frequency ranges. For keys we use the ε-cell id of the widest
  * dims, interleaved — i.e. a coarse Z-order — so range partitions are
  * spatially coherent boxes. Unlike the reference, no custom exchange code
  * exists: Catalyst plans one RangePartitioning shuffle.
  */
object SpatialPartition {

  /** Z-order-interleave the low `bitsPerDim` bits of per-dim cell ids into
    * one long sort key. Cell ids are BIASED into the unsigned range
    * [0, 2^bitsPerDim) and saturated at the ends: raw two's-complement low
    * bits would place cell −1 (all ones) maximally far from cell 0, so
    * origin-centered data — the common case for zero-meaned features —
    * would split its densest region across opposite partition extremes.
    * Cells beyond ±2^(bitsPerDim−1) clamp to the boundary (they stay
    * coarsely sorted, just not distinguished). */
  def zOrderKey(cells: Seq[org.apache.spark.sql.Column],
      bitsPerDim: Int): org.apache.spark.sql.Column = {
    val bias = 1L << (bitsPerDim - 1)
    val top = (1L << bitsPerDim) - 1
    val unsigned = cells.map(c =>
      least(greatest(c + lit(bias), lit(0L)), lit(top)))
    val terms = for {
      b <- 0 until bitsPerDim
      (c, d) <- unsigned.zipWithIndex
    } yield shiftleft(
      shiftright(c, b).bitwiseAND(lit(1L)), b * cells.size + d)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Repartition a point table so partitions are spatially coherent
    * (points within `cellWidth` of each other tend to co-locate):
    * range-partition on the Z-order of ε-cell ids.
    *
    * @param dims dims to interleave (pick 2-3 widest via
    *             [[EpsilonJoin.pickBucketDims]])
    */
  def repartitionSpatially(points: DataFrame, vecCol: String,
      cellWidth: Double, dims: Seq[Int], numPartitions: Int): DataFrame = {
    if (dims.isEmpty) return points.repartition(numPartitions)
    val cellArr = VectorOps.cellId(col(vecCol), cellWidth, dims)
    val cells = dims.indices.map(i => element_at(cellArr, i + 1))
    points
      .withColumn("__zkey", zOrderKey(cells, bitsPerDim = 12))
      .repartitionByRange(numPartitions, col("__zkey"))
      .drop("__zkey")
  }
}
