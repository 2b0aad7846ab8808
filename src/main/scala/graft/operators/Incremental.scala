package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view delta
  * merge: keep a grouped sum/count rollup current under a CDC feed
  * WITHOUT rescanning the base table.
  *
  * The input delta is a **signed row stream** (the standard MV
  * maintenance encoding): insert → the row with sign +1, delete → the
  * old row with sign −1, update → both. Sums and counts are
  * self-maintainable under that algebra (`Σ sign·v` folds into the
  * stored sum); min/max are NOT maintainable under deletes (a removed
  * extremum needs a rescan of its group) and are deliberately not
  * offered here.
  *
  * Scale shape: the delta batch aggregates first (map-side partial —
  * a day's CDC feed collapses to at most one row per touched group),
  * then ONE full-outer hash join onto the stored rollup on the group
  * key. The rollup is group-cardinality-sized, not fact-table-sized,
  * so at 100 TB the expensive side of this plan is reading the delta —
  * the base fact table is never touched. Groups whose row count
  * reaches zero drop out (matching a direct recompute).
  */
object Incremental {

  /** Merge a signed delta into a grouped rollup.
    *
    * @param baseAgg  the stored rollup: groupCols ++ aggCols ++ countCol
    * @param delta    signed rows: groupCols, one value column per agg
    *                 (named by the aggSpec), and `signCol` (+1/−1)
    * @param aggSpec  (rollup sum column, delta value column) pairs
    * @param countCol rollup row-count column (maintained by `Σ sign`)
    * @return the updated rollup, same schema as `baseAgg` */
  def applyDelta(baseAgg: DataFrame, delta: DataFrame,
      groupCols: Seq[String], aggSpec: Seq[(String, String)],
      countCol: String, signCol: String = "sign"): DataFrame = {
    require(aggSpec.nonEmpty, "need at least one maintained sum")
    val aggCols = aggSpec.map(_._1)
    require(baseAgg.columns.toSeq ==
      (groupCols ++ aggCols :+ countCol),
      s"baseAgg columns ${baseAgg.columns.toSeq} != group+aggs+count")
    val dAgg = delta.groupBy(groupCols.map(col): _*)
      .agg(
        aggSpec.map { case (a, v) =>
          sum(col(signCol) * col(v)).as(s"__d_$a")
        }.head,
        (aggSpec.tail.map { case (a, v) =>
          sum(col(signCol) * col(v)).as(s"__d_$a")
        } :+ sum(col(signCol)).cast("long").as("__d_n")): _*)
    baseAgg.join(dAgg, groupCols, "full_outer")
      .select((groupCols.map(col) ++
        aggSpec.map { case (a, _) =>
          // a group absent from one side contributes its identity; the
          // coalesce pair keeps the stored column's type (sign·v above
          // may widen — cast back onto the rollup's declared type)
          (coalesce(col(a), lit(0)) +
            coalesce(col(s"__d_$a"), lit(0)))
            .cast(baseAgg.schema(a).dataType).as(a)
        } :+
        (coalesce(col(countCol), lit(0L)) + coalesce(col("__d_n"), lit(0L)))
          .cast(baseAgg.schema(countCol).dataType).as(countCol)): _*)
      .filter(col(countCol) > 0)
  }
}
