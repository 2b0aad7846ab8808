package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stable global row numbers at scale — the sharding/sampling backbone of
  * a training-data pipeline (deterministic example ids, round-robin shard
  * assignment, skip-free resume). The naive formulation,
  * `row_number().over(Window.orderBy(key))`, collapses the whole table
  * into ONE partition (an `Exchange SinglePartition`) — the canonical
  * Spark scale anti-pattern. This operator produces the identical
  * numbering with a two-pass partition-offset scheme, the distributed
  * classic the reference also uses for its global ids
  * (`start_pos[rank] = Σ point_count[<rank]`, dbscan.cpp:656-661):
  *
  *  1. range-shuffle on the sort key (`repartitionByRange` samples
  *     boundaries, so partitions are balanced) and sort within partitions;
  *  2. count rows per partition — only one long per partition reaches the
  *     driver, never row data;
  *  3. assign `row_num = offset(partition) + local position + 1`, where
  *     the local position is recovered narrowly (no extra shuffle) from
  *     `monotonically_increasing_id()`'s documented layout: partition id
  *     in the upper bits, a 0-based per-partition record counter in the
  *     lower 33. Offsets join back via a broadcast of the tiny
  *     (partition → offset) table.
  */
object GlobalIndex {

  /** Append a 1-based global row number ordered by `sortCols`.
    *
    * `sortCols` must be a total order (include a unique tie-breaker id):
    * range partitioning keeps equal keys in one partition, but their
    * relative order within it — and therefore their numbers — would not be
    * reproducible across runs.
    *
    * The input is persisted internally: pass 2 must see the exact
    * partitioning pass 1 counted (and the range sampling must not run
    * twice). The cached blocks live until the caller's session drops them.
    *
    * @param numPartitions range-partition count; defaults to
    *   `spark.sql.shuffle.partitions`. Size it so partitions fit executor
    *   memory at the target scale, like any other shuffle. */
  def rowNumbers(df: DataFrame, sortCols: Seq[String],
      outCol: String = "row_num", numPartitions: Option[Int] = None): DataFrame = {
    require(sortCols.nonEmpty, "rowNumbers needs at least one sort column")
    val keys = sortCols.map(col)
    val ranged = numPartitions match {
      case Some(np) => df.repartitionByRange(np, keys: _*)
      case None     => df.repartitionByRange(keys: _*)
    }
    val sorted = ranged.sortWithinPartitions(keys: _*).persist()

    // pass 1: per-partition counts (a few longs — never row data). Range
    // partition ids are ordered by key range, so offset(p) = Σ counts(<p).
    val counts: Array[(Int, Long)] = sorted
      .groupBy(spark_partition_id().as("__gidx_pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val offsets = counts.sortBy(_._1)
      .scanLeft((-1, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
      .tail.zip(counts.sortBy(_._1))
      .map { case ((pid, end), (_, n)) => (pid, end - n) }

    // pass 2: narrow id assembly on the SAME cached partitions.
    // monotonically_increasing_id() = (partitionId << 33) + record counter.
    val spark = df.sparkSession
    val offDf = spark.createDataFrame(offsets.toSeq)
      .toDF("__gidx_pid", "__gidx_off")
    sorted
      .withColumn("__gidx_pid", spark_partition_id())
      .withColumn("__gidx_local",
        monotonically_increasing_id() -
          col("__gidx_pid").cast("long") * lit(1L << 33))
      .join(broadcast(offDf), "__gidx_pid")
      .withColumn(outCol, col("__gidx_off") + col("__gidx_local") + lit(1L))
      .drop("__gidx_pid", "__gidx_local", "__gidx_off")
  }
}
