package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout: the persistent form of the reference's geometric
  * pre-partitioning (`geometric_partitioning.cpp:243-497` redistributes
  * points ONCE so every later neighbor probe is rank-local — same idea,
  * applied to relational keys and made durable on storage).
  *
  * Writing both sides of a recurring join bucketed by the join key (same
  * bucket count) lets every subsequent join, aggregation, or window on
  * that key run WITHOUT a shuffle exchange: the scan itself reports the
  * hash-clustered distribution, so Catalyst plans a zero-exchange
  * sort-merge join and a one-stage aggregate. At 100 TB this converts the
  * dominant per-query cost (re-shuffling fact tables on every run) into a
  * one-time write cost — the canonical pattern for fact–fact joins too
  * large to broadcast.
  *
  * Caveats that matter at scale (and are spec-enforced in
  * BucketedJoinSpec):
  *  - both sides must agree on the bucket count (or enable
  *    `spark.sql.bucketing.coalesceBucketsInJoin.enabled` for multiples);
  *  - bucket pruning applies to equality filters on the bucket column —
  *    point lookups read 1/buckets of the data;
  *  - `sortBy` within buckets lets the sort-merge join skip its sort when
  *    each bucket holds one file.
  */
object BucketedTables {

  /** Write `df` as a parquet table bucketed (and optionally bucket-sorted)
    * by `bucketCol`, registered as `table` in the session catalog.
    *
    * @param path optional explicit location (external table); default
    *   stores under the session warehouse dir.
    * @param sortCols within-bucket sort columns; `None` (default) sorts by
    *   the bucket column itself (enables sort-free merge joins),
    *   `Some(Nil)` skips sorting. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, path: Option[String] = None,
      sortCols: Option[Seq[String]] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val sorts = sortCols.getOrElse(Seq(bucketCol))
    var w = df.write.mode(mode).format("parquet")
      .bucketBy(buckets, bucketCol)
    if (sorts.nonEmpty) w = w.sortBy(sorts.head, sorts.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(table)
  }
}
