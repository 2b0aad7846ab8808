package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply — the lakehouse MERGE shape: fold a
  * change stream (insert/update/delete rows with a per-key sequence)
  * onto a base snapshot, latest change wins.
  *
  * The reference engine has no mutation surface at all (SURVEY §2.6 —
  * it reads one immutable binary table per run); this is part of the
  * extension surface a production corpus pipeline needs (nightly
  * snapshot + incremental CDC feed → next snapshot).
  *
  * Scale shape: ONE window shuffle over the changes (partitioned by
  * key — changes ≪ base by assumption; Spark rewrites the rn=1
  * filter into a WindowGroupLimit top-1 per key, so the sort never
  * materializes whole partitions), one hash-distinct of the change
  * keys feeding a LEFT ANTI join against the base, then a narrow
  * union. The base table — the 100 TB side — is never window-sorted
  * and never shuffled beyond the anti join, and AQE broadcasts the
  * changed-keys side when the day's delta is small.
  */
object Cdc {

  /** One row per key: the change with the highest `seqCol`. Ties on
    * the sequence break deterministically by the remaining change
    * columns (descending) — a total order on distinct rows, so the
    * result is partitioning-independent. */
  def latestWins(changes: DataFrame, keyCols: Seq[String],
      seqCol: String): DataFrame = {
    require(!changes.columns.contains("__graft_rn"),
      "changes must not carry a __graft_rn column")
    val tieCols = changes.columns.toSeq
      .filterNot(c => keyCols.contains(c) || c == seqCol)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(seqCol).desc +: tieCols.map(col(_).desc)): _*)
    changes.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1).drop("__graft_rn")
  }

  /** Apply `changes` onto `base`. `changes` must carry the key
    * columns, `seqCol` (ordering), `opCol` ('D' = delete, anything
    * else = upsert), and exactly the base's payload columns. A key's
    * latest change decides its fate: delete drops it, upsert replaces
    * it (or inserts a key absent from the base). Returns the base
    * schema. */
  def apply(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.toSeq.filterNot(keyCols.contains)
    require(!base.columns.contains(seqCol) && !base.columns.contains(opCol),
      s"base must not carry the change-stream columns '$seqCol'/'$opCol'")
    val expect = (keyCols ++ payload).toSet + seqCol + opCol
    require(changes.columns.toSet == expect,
      s"changes columns ${changes.columns.toSeq} != key+seq+op+base-payload")
    // the anti join needs only WHICH keys changed — the distinct key
    // set, not the window: latest-keys == distinct-change-keys, and
    // using the latter keeps the window subtree from executing twice
    // (one hash-distinct branch + ONE window branch, not two windows)
    val changedKeys = changes.select(keyCols.map(col): _*).distinct()
    val untouched = base.join(changedKeys, keyCols, "left_anti")
    val upserts = latestWins(changes, keyCols, seqCol)
      .filter(col(opCol) =!= "D")
      .select(base.columns.map(col).toIndexedSeq: _*)
    untouched.unionByName(upserts)
  }

  /** SCD Type-2 history build: turn a change stream of `valueCol`
    * observations per key into validity intervals. Consecutive
    * repeats of the same value collapse into one interval (only
    * CHANGES open a new row); `valid_to` is the next change's
    * `valid_from`, NULL for the current row. `tieCols` must make the
    * per-key ordering total when `tsCol` can tie.
    *
    * One window shuffle (both windows share the same partitioning and
    * ordering, so Catalyst plans a single exchange + sort). */
  def scd2(changes: DataFrame, keyCols: Seq[String], valueCol: String,
      tsCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol) +: tieCols.map(col)): _*)
    val onChange = changes
      .select((keyCols ++ Seq(valueCol, tsCol) ++ tieCols).map(col): _*)
      .withColumn("__pv", lag(col(valueCol), 1).over(w))
      .filter(col("__pv").isNull || col("__pv") =!= col(valueCol))
    val w2 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((col(tsCol) +: tieCols.map(col)): _*)
    onChange
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols.map(col) ++ Seq(col(valueCol), col("valid_from"),
        col("valid_to"), col("is_current"))): _*)
  }

  /** Snapshot diff — the audit inverse of [[apply]]: given two table
    * versions, report every key that was added, removed, or changed
    * (compared columns differ, null-safe). The lakehouse
    * "what did last night's load actually do" / replication-drift
    * check; `apply(old, diff-as-changes) == new` is the round-trip
    * property.
    *
    * Plan shape: one FULL OUTER hash join co-partitioned on the key —
    * each snapshot shuffles once, nothing sorts, and the 'unchanged'
    * majority (the 100 TB common case) is filtered before anything
    * downstream sees it. Compared columns surface as `old_<c>` /
    * `new_<c>` pairs (null on the absent side).
    *
    * @param compareCols columns (present in both snapshots) whose
    *   null-safe inequality makes a key 'changed'
    * @param includeUnchanged keep 'unchanged' rows too (off by
    *   default: the diff should cost output proportional to the
    *   change volume, not the table)
    * @return (keyCols…, status, old_<c>…, new_<c>…) */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    require(compareCols.nonEmpty, "need at least one compared column")
    def side(df: DataFrame, tag: String): DataFrame = {
      val cols = keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"${tag}_$c")) :+
        lit(1).as(s"__$tag")
      df.select(cols: _*)
    }
    val joined = side(oldDf, "old")
      .join(side(newDf, "new"), keyCols, "full_outer")
    val same = compareCols
      .map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduceLeft(_ && _)
    val status = when(col("__old").isNull, lit("added"))
      .when(col("__new").isNull, lit("removed"))
      .when(same, lit("unchanged"))
      .otherwise(lit("changed"))
    val out = joined.withColumn("status", status)
      .select((keyCols.map(col) :+ col("status")) ++
        compareCols.flatMap(c =>
          Seq(col(s"old_$c"), col(s"new_$c"))): _*)
    if (includeUnchanged) out else out.filter(col("status") =!= "unchanged")
  }
}
