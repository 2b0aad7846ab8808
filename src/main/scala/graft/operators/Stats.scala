package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust-statistics and moment-based analytics over grouped numeric
  * columns — the profiling layer above [[QualityCheck]]'s hard
  * constraints: detect distributional anomalies (MAD outliers) and
  * redundant measures (correlation matrix) before training on a table.
  *
  * Numerics follow the engine's exactness rules: inputs quantize to
  * integers (cents), medians evaluate at dyadic p=0.5 over integer
  * grids (exact interpolated arithmetic in a double — q73's invariant),
  * moment sums accumulate as decimal(38,0), and only the final
  * ratio/sqrt run in double with a fixed expression order — so every
  * output is independent of row order and partitioning, and a SQL twin
  * reproduces it bit-for-bit.
  */
object Stats {

  /** Median/MAD outlier report per group over an integer-quantized
    * value: values more than `k`× the median-absolute-deviation from
    * the median are outliers (the robust z-score — immune to the very
    * outliers it hunts, unlike stddev-based rules).
    *
    * Scale: two grouped exact-percentile aggregates (the group medians
    * broadcast back onto the rows — groups are few, rows are many) and
    * one closing aggregate; rows shuffle once per percentile pass.
    * Integer trick: values scale to HALF-cents so the two-point median
    * interpolation stays integral, deviations to QUARTER-cents so the
    * MAD does too — every comparison is then exact.
    *
    * @param valCents integer-cents expression over the input rows.
    * @return (groupCols..., n, n_outliers, mad) — mad in input units. */
  def madOutliers(df: DataFrame, groupCols: Seq[String], valCents: Column,
      k: Int = 3): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val o = df.select((g :+ (valCents * 2).cast("long").as("__hc")): _*)
    // half-cents are even ⇒ the p=.5 two-point midpoint is an integer
    val med = o.groupBy(g: _*)
      .agg(expr("percentile(__hc, 0.5)").as("__med_hc"))
    val dev = o.join(broadcast(med), groupCols)
      .select((g :+ (abs(col("__hc") - col("__med_hc")) * 2)
        .as("__dev_qc")): _*)
    val mad = dev.groupBy(g: _*)
      .agg(expr("percentile(__dev_qc, 0.5)").as("__mad_qc"))
    dev.join(broadcast(mad), groupCols)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col("__dev_qc") > col("__mad_qc") * k, 1L).otherwise(0L))
          .as("n_outliers"),
        first(col("__mad_qc")).as("__m"))
      .withColumn("mad", col("__m") / 400.0) // quarter-cents → units
      .drop("__m")
  }

  /** Pairwise Pearson correlation matrix over integer-quantized
    * columns, in ONE aggregate pass: per variable pair, corr derives
    * from decimal-exact (n, Σx, Σy, Σxy, Σx², Σy²) with the final
    * arithmetic in double in a fixed order — `corr()`'s streaming
    * accumulator would be row-order dependent; this is not.
    *
    * @param vars (name, integer-valued expression) per variable.
    * @return (var_a, var_b, corr) for each unordered pair, name order. */
  def corrMatrix(df: DataFrame, vars: Seq[(String, Column)]): DataFrame = {
    require(vars.size >= 2, "need at least two variables")
    // widen to decimal BEFORE multiplying: long products overflow by
    // silent wraparound above ~3e9 input magnitude (a wrong-but-
    // plausible correlation); decimal products are exact to 1e38 and
    // overflow to NULL — detectable, and matching the HUGEINT twin
    val z = df.select(vars.map { case (n, c) =>
      c.cast("long").cast("decimal(38,0)").as(n) }: _*)
    val aggs = Seq(count(lit(1)).as("n")) ++
      vars.flatMap { case (n, _) => Seq(
        sum(col(n)).as(s"s_$n"),
        sum(col(n) * col(n)).as(s"ss_$n"))
      } ++
      pairs(vars.map(_._1)).map { case (a, b) =>
        sum(col(a) * col(b)).as(s"sp_${a}_$b")
      }
    val m = z.agg(aggs.head, aggs.tail: _*)
    val rows = pairs(vars.map(_._1)).map { case (a, b) =>
      val num = (col("n") * col(s"sp_${a}_$b") -
        col(s"s_$a") * col(s"s_$b")).cast("double")
      val den = sqrt((col("n") * col(s"ss_$a") -
        col(s"s_$a") * col(s"s_$a")).cast("double")) *
        sqrt((col("n") * col(s"ss_$b") -
          col(s"s_$b") * col(s"s_$b")).cast("double"))
      struct(lit(a).as("var_a"), lit(b).as("var_b"),
        round(num / den, 6).as("corr"))
    }
    m.select(explode(array(rows: _*)).as("p"))
      .select(col("p.var_a").as("var_a"), col("p.var_b").as("var_b"),
        col("p.corr").as("corr"))
  }

  private def pairs(names: Seq[String]): Seq[(String, String)] =
    for {
      i <- names.indices
      j <- (i + 1) until names.size
    } yield (names(i), names(j))
}
