package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval overlap join: all pairs (a, b) with `a.lo <= b.hi AND
  * b.lo <= a.hi` — the temporal analog of the ε-join's spatial
  * neighborhood (SURVEY §2.3 IX-2 machinery re-keyed from ε-grid cells
  * to time bins). The reference engine has no interval operator
  * (SURVEY §2.6); this is part of the events-pipeline extension
  * surface (concurrency analysis, conflict detection, downtime
  * attribution).
  *
  * Spark-first plan — NOT a theta join (which Catalyst can only run as
  * BroadcastNestedLoop / cartesian): each interval explodes to the
  * fixed-width time bins it touches (narrow), candidates meet in an
  * equi-join on the bin id, and the exact overlap predicate filters
  * in-bin false positives. A pair overlapping k shared bins is emitted
  * ONCE — only from the bin containing the overlap's start,
  * `floor(max(a.lo, b.lo) / w)` — so no distinct/dedup shuffle is ever
  * needed (same report-once trick as EpsilonJoin's half-space cell
  * ownership).
  *
  * Scale: shuffle volume is rows × (len/w + 1) bin copies; per-bin work
  * is quadratic in bin occupancy. Pick `binWidth` near the typical
  * interval length (shorter ⇒ more copies, longer ⇒ fatter bins); a
  * hot bin (everyone online at the same minute) is an AQE skew-join
  * case, exactly like a dense ε-cell.
  */
object IntervalJoin {

  /** @param left      intervals; all columns pass through as `a_<col>`
    * @param right     intervals; all columns pass through as `b_<col>`
    * @param loCol     inclusive interval start (non-negative long/int)
    * @param hiCol     inclusive interval end, >= start
    * @param binWidth  bucketing width in the interval columns' own unit
    * @return one row per overlapping (left, right) pair */
  def overlapJoin(left: DataFrame, right: DataFrame,
      loCol: String, hiCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, prefix: String): DataFrame = {
      val renamed =
        df.select(df.columns.toSeq.map(c => col(c).as(s"$prefix$c")): _*)
      // DIV (floor division on longs) — a double-division floor would
      // lose exactness past 2^53; interval bounds are epoch-scale longs
      renamed.withColumn("_bin",
        explode(sequence(col(s"$prefix$loCol") div binWidth,
          col(s"$prefix$hiCol") div binWidth)))
    }
    val a = binned(left, "a_")
    val b = binned(right, "b_")
    val overlap = col(s"a_$loCol") <= col(s"b_$hiCol") &&
      col(s"b_$loCol") <= col(s"a_$hiCol")
    // report-once: only the bin where the overlap STARTS emits the pair
    val owner = a("_bin") ===
      (greatest(col(s"a_$loCol"), col(s"b_$loCol")) div binWidth)
    a.join(b, a("_bin") === b("_bin") && overlap && owner)
      .drop("_bin")
  }

  /** Point-in-interval join: all (point, interval) pairs with
    * `lo <= t <= hi` — the stabbing-query sibling of [[overlapJoin]]
    * (an instantaneous event against a set of validity windows:
    * concurrency counting, temporal fact lookup, downtime blame).
    *
    * Same bin trick, simpler ownership: a point lives in exactly ONE
    * bin, so every qualifying pair meets exactly once in the equi-join
    * on that bin and no report-once predicate is needed. Intervals
    * still replicate to every bin they touch (len/w + 1 copies);
    * points never replicate — at 100 TB put the big table on the
    * point side when the model allows.
    *
    * @param points    one row per instant; columns pass through as `p_<col>`
    * @param intervals one row per [lo, hi] window; columns pass through
    *                  as `i_<col>`
    * @param tsCol     the point instant (non-negative long/int)
    * @param loCol     inclusive interval start
    * @param hiCol     inclusive interval end, >= start
    * @param binWidth  bucketing width in the columns' own unit
    * @return one row per (point, interval) containment pair */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      tsCol: String, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points
      .select(points.columns.toSeq.map(c => col(c).as(s"p_$c")): _*)
      .withColumn("_bin", col(s"p_$tsCol") div binWidth)
    val iv = intervals
      .select(intervals.columns.toSeq.map(c => col(c).as(s"i_$c")): _*)
      .withColumn("_bin", explode(sequence(col(s"i_$loCol") div binWidth,
        col(s"i_$hiCol") div binWidth)))
    val contains = col(s"i_$loCol") <= col(s"p_$tsCol") &&
      col(s"p_$tsCol") <= col(s"i_$hiCol")
    p.join(iv, p("_bin") === iv("_bin") && contains).drop("_bin")
  }

  /** Per-key union length of HALF-OPEN intervals [lo, hi): merges
    * overlapping/touching intervals (the classic sweep) and reports,
    * per key, how much of the timeline is covered — machine busy time,
    * user active time, SLA downtime credit. The measure-side complement
    * of [[overlapJoin]]: that one asks "which intervals touch", this
    * one asks "how much do they cover" without ever materializing a
    * pair.
    *
    * Plan shape: ONE exchange. The sweep is a gaps-and-islands pass —
    * sort within each key by (lo, tieCols), open a new island when
    * `lo > max(hi)` over all preceding intervals (touching intervals,
    * lo == prev hi, MERGE — correct for half-open bounds), number
    * islands with a running sum; both collapse aggregates reuse the
    * window's hash(key) partitioning (grouping keys are supersets of
    * the partition key). Contained intervals ([5,6) inside [0,10)) are
    * absorbed by the running max — a lag-based gap test would reopen
    * an island at the contained interval's hi and overcount.
    *
    * @param tieCols extra ordering columns making (lo, tieCols) unique
    *   per key — required for cross-engine determinism when starts tie
    * @return (keyCols*, n_intervals, n_islands, covered) where covered
    *   = Σ island (hi − lo), an exact long in the input's own unit */
  def unionLength(intervals: DataFrame, keyCols: Seq[String],
      loCol: String, hiCol: String,
      tieCols: Seq[String] = Nil): DataFrame =
    mergeIntervals(intervals, keyCols, loCol, hiCol, tieCols)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n_intervals")).cast("long").as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("hi") - col("lo")).cast("long").as("covered"))

  /** The merged-islands half of [[unionLength]], exposed on its own:
    * collapse each key's overlapping/touching half-open intervals into
    * maximal disjoint islands. Same one-exchange gaps-and-islands sweep
    * (running max absorbs contained intervals); callers that need the
    * island BOUNDS — interval subtraction, span cutting, coverage maps —
    * compose on this instead of re-deriving the sweep.
    * @return (keyCols*, lo, hi, n_intervals) — one row per island, in
    *   the input columns' own types. */
  def mergeIntervals(intervals: DataFrame, keyCols: Seq[String],
      loCol: String, hiCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "mergeIntervals needs at least one key column")
    import org.apache.spark.sql.expressions.Window
    val key = keyCols.map(col)
    val ord = (col(loCol) +: tieCols.map(col)).map(_.asc)
    val w = Window.partitionBy(key: _*).orderBy(ord: _*)
    val prevMax = max(col(hiCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    intervals
      .withColumn("__new",
        when(prevMax.isNull || col(loCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(key :+ col("__island"): _*)
      .agg(min(col(loCol)).as("lo"), max(col(hiCol)).as("hi"),
        count(lit(1)).as("n_intervals"))
      .select(key ++ Seq(col("lo"), col("hi"), col("n_intervals")): _*)
  }

  private implicit final class DivOps(private val c: Column) extends AnyVal {
    /** SQL `DIV`: exact floor division on integral types (the `/`
      * operator widens to double). Operands here are non-negative. */
    def div(w: Long): Column = org.apache.spark.sql.GraftInternals.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftInternals.expression(c),
        org.apache.spark.sql.catalyst.expressions.Literal(w)))
  }
}
