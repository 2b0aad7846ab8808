package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-layout control for write paths — at 100 TB the dominant
  * cost of most queries is the scan, and the scan's cost is decided at
  * WRITE time: row-group statistics only prune when values are
  * clustered, and a directory of millions of tiny files drowns the
  * driver in planning overhead.
  *
  * [[writeSorted]] range-partitions on the cluster columns and sorts
  * within partitions before writing — each parquet row group then
  * covers a narrow value range, so a selective filter's min/max
  * pushdown skips most groups entirely (spec-measured: the same
  * filter reads orders of magnitude fewer rows from a sorted copy
  * than from a shuffled one). For multi-dimensional access patterns,
  * interleave the dimensions first (e.g. Z-order via
  * [[SpatialPartition]]) and sort on the interleaved key.
  *
  * [[compact]] is the small-files remedy: explicit output-file count
  * from a target rows-per-file, one round-robin shuffle.
  */
object Layout {

  /** Write `df` clustered on `sortCols`: range-partition (so files
    * cover disjoint ranges) then sort within partitions (so row groups
    * within a file cover narrow ranges).
    * @param rowGroupBytes parquet block size; the skipping granularity
    *   (smaller groups skip more precisely, cost more metadata). */
  def writeSorted(df: DataFrame, sortCols: Seq[String], path: String,
      rowGroupBytes: Long = 128L * 1024 * 1024): Unit = {
    require(sortCols.nonEmpty, "need at least one sort column")
    df.repartitionByRange(sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .option("parquet.block.size", rowGroupBytes)
      .parquet(path)
  }

  /** Rewrite `df` into ⌈rows / targetRowsPerFile⌉ similar-sized files
    * (round-robin repartition — a balance shuffle, no key skew). */
  def compact(df: DataFrame, targetRowsPerFile: Long, path: String): Unit = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val rows = df.count()
    val files = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile)
      .min(Int.MaxValue.toLong).toInt
    df.repartition(files).write.parquet(path)
  }
}
