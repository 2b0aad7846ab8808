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

  /** Join/partition-key skew report: the top-K hottest values of a key
    * with their absolute and cumulative share of the table — the
    * number you read BEFORE deciding between a plain shuffle join,
    * [[graft.operators.SkewJoin]] salting, or AQE skew splitting. A key
    * whose top value holds 20% of 100 TB puts 20 TB in one reducer;
    * this report is one cheap aggregate, the hung stage is hours.
    *
    * Plan shape: one count aggregate on hash(key); the top-K comes
    * from `orderBy(…).limit(k)` — Catalyst's TakeOrderedAndProject, a
    * per-partition bounded heap + driver merge of K×partitions rows,
    * NEVER a global sort; the rank/cumulative window then runs over K
    * rows on one task (K is small by contract). Totals ride a
    * broadcast single-row cross join.
    *
    * @return (rank, key(string), cnt, share, cum_share, n_keys,
    *   n_rows) — rank by (cnt DESC, key ASC), shares rounded to 6 */
  def keySkew(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val cnts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .persist() // read by the totals aggregate and the top-K
    val totals = cnts.agg(count(lit(1)).as("n_keys"),
      sum("cnt").cast("long").as("n_rows"))
    val top = cnts.orderBy(col("cnt").desc, col("key").asc).limit(topK)
    // window over ≤ topK rows — single tiny task by construction
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("key").asc)
    top
      .withColumn("rank", row_number().over(w))
      .withColumn("cum", sum("cnt").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .crossJoin(broadcast(totals))
      .select(col("rank"), col("key"), col("cnt"),
        round(col("cnt").cast("double") / col("n_rows"), 6).as("share"),
        round(col("cum").cast("double") / col("n_rows"), 6).as("cum_share"),
        col("n_keys"), col("n_rows"))
  }

  /** Equi-DEPTH histogram over an integer-quantized value: `buckets`
    * quantile-bounded bins with their row counts — the planner-grade
    * distribution summary ([[keySkew]] profiles a KEY's frequency;
    * this profiles a VALUE's shape, the input to range-partition
    * boundaries and skew-aware cost estimates). Unlike the fixed-width
    * histogram (q63), bin edges adapt to the data: every bin holds
    * ≈ n/buckets rows, so the tails get resolution where a fixed grid
    * wastes it.
    *
    * Numerics: `buckets` must be a power of two so every quantile sits
    * at dyadic p over integers — exact interpolated arithmetic in a
    * double (q73's invariant), making bin edges AND bin assignment
    * (comparisons against exact edges) bit-reproducible cross-engine.
    *
    * Plan shape: one exact-percentile aggregate (rows shuffle once),
    * the 9-element edge array broadcasts back, one count aggregate
    * over `buckets` groups. At 100 TB swap `percentile` for
    * `approx_percentile` — same plan, sketch-merge instead of exact
    * (then not oracle-exact).
    *
    * @param valCents integer-cents expression over the input rows
    * @param scale report edges in input units: cents→units = 100
    * @return (bucket, lo, hi, n) — bucket k ∈ [0, buckets); a value
    *   lands in the highest bucket whose lower edge it reaches, so
    *   heavy ties can leave interior buckets empty (absent rows) */
  def equiDepthHist(df: DataFrame, valCents: Column, buckets: Int = 8,
      scale: Long = 100L): DataFrame = {
    require(buckets >= 2 && buckets <= 64 &&
      (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two in [2, 64], got $buckets")
    val o = df.select(valCents.cast("long").as("__c"))
    val ps = (0 to buckets).map(k => k.toDouble / buckets)
    val q = o.agg(
      expr(s"percentile(__c, array(${ps.mkString(", ")}))").as("__qs"))
    // interior edges only: k = 1..buckets-1 (array is 1-indexed)
    val bucket = (1 until buckets)
      .map(k => when(col("__c") >= element_at(col("__qs"), k + 1), 1)
        .otherwise(0))
      .reduceLeft(_ + _)
    o.crossJoin(broadcast(q))
      .withColumn("bucket", bucket)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), first(col("__qs")).as("__q"))
      .select(col("bucket"),
        round(element_at(col("__q"), col("bucket") + 1) / scale, 6)
          .as("lo"),
        round(element_at(col("__q"), col("bucket") + 2) / scale, 6)
          .as("hi"),
        col("n"))
  }
}
