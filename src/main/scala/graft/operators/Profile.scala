package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** ANALYZE-style column profiling: one pass over the table produces a
  * per-column summary report — row count, non-null count, exact
  * distinct count, and min/max (typed: numeric columns report
  * `min_num`/`max_num`, string columns `min_str`/`max_str`). The
  * reference engine's only "profile" is the bounding-box fold
  * (`geometric_partitioning.cpp:637-654`, SURVEY §2.2 GP-4) — this is
  * its generalization to relational tables, the stats a query planner
  * or data-quality gate reads first.
  *
  * Plan shape: ONE aggregate over the table. The exact distinct counts
  * make it an Expand-based multi-distinct aggregate (each input row is
  * replicated once per distinct-counted column, each copy keyed to its
  * own grouping id — Catalyst's standard rewrite); min/max/count ride
  * the same pass. The single result row then pivots to one row per
  * column with a narrow explode — no second scan, no per-column jobs.
  * At 100 TB the Expand factor (#distinct columns) is the knob: profile
  * the columns you need, or swap `approx_count_distinct` in via
  * `exactDistinct = false` for a single-replication sketch pass.
  */
object Profile {

  /** @param df    table to profile
    * @param cols  columns to report (numeric or string)
    * @param exactDistinct exact `count(DISTINCT c)` (Expand pass) when
    *   true; HLL `approx_count_distinct` when false (the 100 TB path —
    *   not oracle-exact, so the oracled query keeps the default)
    * @return one row per profiled column:
    *   (col_name, n_rows, n_nonnull, n_distinct,
    *    min_num, max_num, min_str, max_str) */
  def profile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // duplicates would alias two aggregate sets identically and fail
    // later with an opaque AMBIGUOUS_REFERENCE at the pivot
    require(cols.distinct.size == cols.size,
      s"profiled columns must be unique, got $cols")
    val nullNum = lit(null).cast("double")
    val nullStr = lit(null).cast("string")
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      val dt = df.schema(c).dataType
      val (mnN, mxN, mnS, mxS) = dt match {
        case _: NumericType =>
          (min(col(c)).cast("double"), max(col(c)).cast("double"),
            nullStr, nullStr)
        case StringType =>
          (nullNum, nullNum, min(col(c)), max(col(c)))
        case other => throw new IllegalArgumentException(
          s"profile supports numeric and string columns; $c is $other")
      }
      val nd = if (exactDistinct) countDistinct(col(c))
        else approx_count_distinct(col(c))
      Seq(count(col(c)).as(s"${c}__nn"), nd.as(s"${c}__nd"),
        mnN.as(s"${c}__mnn"), mxN.as(s"${c}__mxn"),
        mnS.as(s"${c}__mns"), mxS.as(s"${c}__mxs"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"), col("n_rows"),
        col(s"${c}__nn").as("n_nonnull"), col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mnn").as("min_num"), col(s"${c}__mxn").as("max_num"),
        col(s"${c}__mns").as("min_str"), col(s"${c}__mxs").as("max_str")
      )): _*)).as("p"))
      .select(col("p.*"))
  }
}
