package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
      // a zero-variance variable has no defined correlation: NULL, not
      // an ANSI divide-by-zero error (degree-regular graphs hit this
      // through GraphStats.degreeAssortativity)
      struct(lit(a).as("var_a"), lit(b).as("var_b"),
        when(den =!= lit(0.0), round(num / den, 6)).as("corr"))
    }
    m.select(explode(array(rows: _*)).as("p"))
      .select(col("p.var_a").as("var_a"), col("p.var_b").as("var_b"),
        col("p.corr").as("corr"))
  }

  /** Exact ROC-AUC of a score against a binary label — the Mann-Whitney
    * U statistic with the standard tie correction (tied positive/negative
    * pairs count 1/2), computed without ever ranking individual rows:
    * group by DISTINCT score, then one cumulative pass over the
    * score-histogram table,
    * `U = Σ_s p_s · (negBelow(s) + n_s/2)`, doubled to stay integral.
    *
    * Scale shape: one hash aggregate over the rows (shuffle keyed by
    * score), then a window over the distinct-score table only. That
    * table is the knob — AND the contract: the caller passes an
    * already-quantized score (cents, basis points) so its cardinality
    * is bounded and the single-partition cumulative window is over
    * thousands of rows, not billions. A raw continuous score breaks
    * that contract (distinct ≈ N → one-task sort of the corpus): use
    * [[aucBinned]] there. All arithmetic is exact integers
    * (decimal-38 for the U sum) until the one final division.
    *
    * @param positive  boolean column: row is a positive example
    * @param score     integral score column (quantize floats first)
    * @return single row (auc, n_pos, n_neg); auc is NULL when either
    *   class is empty (0/0) */
  def auc(df: DataFrame, positive: Column, score: Column): DataFrame =
    aucCore(df
      // NULL scores are unrankable and must be EXCLUDED, not treated as
      // a lowest-score group: Spark windows order ASC NULLS FIRST
      // (DuckDB defaults to NULLS LAST), so keeping them would both
      // skew the AUC and silently diverge from a SQL twin. A NULL
      // `positive` counts as negative (when/otherwise semantics).
      .select(score.as("s"), when(positive, 1L).otherwise(0L).as("y"))
      .filter(col("s").isNotNull))

  /** [[auc]] for CONTINUOUS scores — the cardinality-safe variant. The
    * exact path's distinct-score histogram IS its scale contract: on an
    * already-quantized score (cents, basis points) the cumulative
    * window runs over thousands of rows; on a raw continuous score,
    * distinct ≈ N and that window degenerates to a single-task sort of
    * the corpus. Here the score is first bucketed into `nBins`
    * equal-width bins over the observed [min, max] (one scalar
    * aggregate, broadcast back — never collected row data), and the
    * same tie-corrected U statistic runs on the bin histogram: the
    * window is over ≤ nBins rows BY CONSTRUCTION, independent of data
    * volume. Within-bin pairs count 1/2 (the tie correction), so the
    * result is the exact AUC of the binned ranking — equal to the
    * un-binned AUC whenever binning preserves the score's distinct
    * order (spec-pinned: bin width ≤ 1 on integer scores reproduces
    * [[auc]] exactly) and within O(1/nBins) of it otherwise.
    *
    * Non-finite scores (NaN AND ±Infinity) are excluded alongside
    * NULLs — an Infinity would poison the min/max bounds just like a
    * NaN (one +Inf makes every finite width computation collapse into
    * bin 0 and the AUC silently degenerate). A degenerate score
    * (min == max) puts every row in bin 0 — AUC 0.5 by tie
    * correction, the right answer for a constant ranking. */
  def aucBinned(df: DataFrame, positive: Column, score: Column,
      nBins: Int = 10000): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val src = df
      .select(score.cast("double").as("s"),
        when(positive, 1L).otherwise(0L).as("y"))
      .filter(col("s").isNotNull && !isnan(col("s")) &&
        abs(col("s")) =!= lit(Double.PositiveInfinity))
    val mm = src.agg(min("s").as("mn"), max("s").as("mx"))
    aucCore(src.crossJoin(broadcast(mm))
      .select(
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("s") - col("mn")) / (col("mx") - col("mn"))
              * lit(nBins.toDouble)).cast("long"),
            lit(nBins - 1L))).as("s"),
        col("y")))
  }

  /** Shared U-statistic core over a (s, y) stream: histogram by score,
    * one cumulative pass over the distinct-score table. */
  private def aucCore(src: DataFrame): DataFrame = {
    val byScore = src
      .groupBy("s")
      .agg(sum("y").as("p"), (count(lit(1)) - sum("y")).as("ng"))
    // negatives strictly below this score; ties handled by the + n_s term
    val w = org.apache.spark.sql.expressions.Window.orderBy("s")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    byScore
      .withColumn("cn", coalesce(sum("ng").over(w), lit(0L)))
      .agg(
        sum(col("p").cast("decimal(38,0)") *
          (col("cn") * 2 + col("ng")).cast("decimal(38,0)")).as("u2"),
        sum("p").as("n_pos"), sum("ng").as("n_neg"))
      .select(
        // an empty class has no ranking to measure: NULL, not an ANSI
        // divide-by-zero error
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("u2").cast("double") /
            (col("n_pos").cast("double") * col("n_neg").cast("double")
              * lit(2.0)), 6)).as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** Per-group average precision — the ranked-retrieval eval beside
    * [[auc]]: AP = (Σ_{k : rel@k} precision@k) / n_pos over the group's
    * ranking by (score DESC, tie ASC). The explicit integral tie column
    * makes the ranking a total order both engines reproduce exactly
    * (the q80 lead() discipline) — AP, unlike AUC, has no natural
    * tie-averaged form, so the order IS the definition.
    *
    * Scale shape: windows partition by the group (a query id in the
    * MAP-over-queries use), so every ranking is a per-query partition —
    * parallel across queries, never a global sort. Numerics:
    * precision@k = cumP/k is one division of exact integers (identical
    * doubles both engines), each term round(9) then decimal-summed
    * exactly; one closing division (the q139 discipline).
    *
    * @param positive boolean column; NULL counts negative
    * @param score    integral score column (quantize floats first);
    *                 NULL-score rows are excluded (unrankable — the
    *                 [[auc]] rule)
    * @return (groupCols..., n_pos, n_rows, ap); ap NULL when the group
    *   has no positives. */
  def averagePrecision(df: DataFrame, groupCols: Seq[String],
      positive: Column, score: Column, tie: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__s").desc, col("__t"))
    df.select((g :+ score.as("__s") :+ tie.as("__t") :+
        when(positive, 1L).otherwise(0L).as("__y")): _*)
      .filter(col("__s").isNotNull)
      .withColumn("__k", row_number().over(w))
      .withColumn("__cp", sum(col("__y")).over(w))
      .groupBy(g: _*)
      .agg(sum(col("__y")).as("n_pos"), count(lit(1)).as("n_rows"),
        sum(when(col("__y") === 1,
            round(col("__cp").cast("double") / col("__k").cast("double"), 9))
          .otherwise(lit(0.0)).cast("decimal(38,9)")).as("__ap_sum"))
      .select((g :+ col("n_pos") :+ col("n_rows") :+
        when(col("n_pos") > 0,
          round(col("__ap_sum").cast("double") /
            col("n_pos").cast("double"), 6)).as("ap")): _*)
  }

  /** Per-group normalized discounted cumulative gain — the
    * graded-relevance eval beside [[averagePrecision]]'s binary one:
    *
    *   DCG  = Σ_k (2^rel_k − 1) / log2(k + 1)   over (score DESC, tie)
    *   IDCG = the same sum over the IDEAL ranking (rel DESC, tie)
    *   nDCG = DCG / IDCG
    *
    * Both rankings come from ONE pass — two row_numbers over the same
    * group partition — so the input is read once and the windows are
    * per-group (parallel across queries, never a global sort).
    * Numerics: gains are exact integers (`shiftleft`); each term pays
    * one libm log2 whose ±1-ulp engine skew is absorbed by round(9)
    * before the exact decimal sum (the q74 discipline); one closing
    * division.
    *
    * @param rel integral relevance grade ≥ 0 (cap it — gain is 2^rel);
    *   NULL-score AND NULL-rel rows are excluded (the [[auc]] rule —
    *   a NULL grade must not consume a rank position and deflate
    *   later rows' discounts)
    * @return (groupCols..., n_rows, ndcg); ndcg NULL when IDCG = 0
    *   (no relevant rows). */
  def ndcg(df: DataFrame, groupCols: Seq[String], rel: Column,
      score: Column, tie: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    def w(order: Column) = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(order.desc, col("__t"))
    def term(k: Column) = round(col("__gain").cast("double") /
      log2(k.cast("double") + lit(1.0)), 9).cast("decimal(38,9)")
    df.select((g :+ rel.as("__r") :+ score.as("__s") :+ tie.as("__t")): _*)
      .filter(col("__s").isNotNull && col("__r").isNotNull)
      .select((g :+ col("__r") :+ col("__s") :+ col("__t") :+
        expr("shiftleft(1L, CAST(__r AS INT)) - 1L").as("__gain")): _*)
      .withColumn("__kd", row_number().over(w(col("__s"))))
      .withColumn("__ki", row_number().over(w(col("__r"))))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(term(col("__kd"))).as("__dcg"),
        sum(term(col("__ki"))).as("__idcg"))
      .select((g :+ col("n_rows") :+
        when(col("__idcg") > 0,
          round(col("__dcg").cast("double") /
            col("__idcg").cast("double"), 6)).as("ndcg")): _*)
  }

  /** [[rbo]]'s per-depth weights W(m) = Σ_{d=m..D} p^(d−1)/d, each
    * round(9) so the engine's decimal conversion is exact. Driver-side
    * in fixed ascending fold order; public so oracle SQL can inline the
    * IDENTICAL literals. */
  def rboWeights(depth: Int, p: Double): Seq[Double] =
    (1 to depth).map(m => math.rint(
      (m to depth).map(dd => math.pow(p, dd - 1) / dd).sum * 1e9) / 1e9)

  /** Rank-biased overlap at prefix depth D (Webber, Moffat & Zobel
    * 2010) between two top-D rankings per group — the ranking-agreement
    * eval (e.g. ANN serving vs exact ranking, yesterday's index vs
    * today's):
    *
    *   RBO@D = (1−p) Σ_{d=1..D} p^(d−1) · |A_d ∩ B_d| / d
    *
    * over depth-d prefixes A_d/B_d. Per matched item at ranks
    * (ra, rb), the contribution telescopes to W(max(ra, rb)) with
    * W(m) = Σ_{d=m..D} p^(d−1)/d — D weights computed ONCE driver-side
    * ([[rboWeights]]) and inlined as literals, so the engine pass is
    * one equi-join of two ≤D-per-group tables + one lookup + one exact
    * decimal sum per group. This is the prefix-truncated RBO@D, not the
    * extrapolated RBO_ext (at prefix scale the residual term is the
    * caller's call). Default p = 7/8 — dyadic, inside the paper's
    * recommended persistence range.
    *
    * @param rankA/@param rankB (`g`, `item`, `rnk`) — `rnk` 1-based
    *   within group; rows beyond `depth` are filtered here, so passing
    *   full rankings is fine
    * @return (g, rbo) for every group of `rankA` (0.0 when the
    *   prefixes are disjoint). */
  def rbo(rankA: DataFrame, rankB: DataFrame, depth: Int,
      p: Double = 0.875, scale: Int = 6): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    val w = rboWeights(depth, p)
    val a = rankA.select(col("g"), col("item"), col("rnk").as("__ra"))
      .filter(col("__ra") <= depth)
    val b = rankB.select(col("g"), col("item"), col("rnk").as("__rb"))
      .filter(col("__rb") <= depth)
    val matched = a.join(b, Seq("g", "item"))
      .select(col("g"),
        element_at(typedlit(w),
          greatest(col("__ra"), col("__rb")).cast("int")).as("__w"))
      .groupBy("g")
      .agg(sum(col("__w").cast("decimal(38,9)")).as("__s"))
    rankA.select(col("g")).distinct()
      .join(matched, Seq("g"), "left")
      .select(col("g"),
        round(lit(1.0 - p) *
          coalesce(col("__s").cast("double"), lit(0.0)), scale).as("rbo"))
  }

  /** Winsorized mean per group: values clipped to the group's exact
    * [p25, p75] before averaging — the robust location estimate that,
    * unlike trimming, keeps n constant. Quantiles at dyadic p over
    * QUARTER-cents (×4) are exact integral doubles in any engine
    * (the madOutliers scaling trick, one step finer), so the clip
    * compares exact numbers and the mean is an integer sum with one
    * final division.
    *
    * Scale: one grouped percentile aggregate (rows shuffle once), the
    * tiny quantile table broadcasts back, one closing aggregate.
    *
    * @param valCents integer-cents expression over the input rows
    * @return (groupCols..., n, lo, hi, wmean) — lo/hi/wmean in input
    *   units. */
  def winsorizedMean(df: DataFrame, groupCols: Seq[String],
      valCents: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val o = df.select((g :+ (valCents * 4).cast("long").as("__qc")): _*)
    val q = o.groupBy(g: _*).agg(
      expr("percentile(__qc, 0.25)").as("__lo"),
      expr("percentile(__qc, 0.75)").as("__hi"))
    o.join(broadcast(q), groupCols)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        // clipped values are integral doubles (quantiles are exact at
        // dyadic p over ×4 ints), so the decimal cast and sum are exact
        sum(greatest(col("__lo"), least(col("__hi"), col("__qc")))
          .cast("decimal(38,0)")).as("__s"),
        first(col("__lo")).as("__l"), first(col("__hi")).as("__h"))
      .select((g ++ Seq(col("n"),
        round(col("__l") / 400.0, 6).as("lo"),
        round(col("__h") / 400.0, 6).as("hi"),
        round(col("__s").cast("double") / col("n") / 400.0, 6)
          .as("wmean"))): _*)
  }

  /** Exact weighted (lower) median per group: the smallest value v with
    * cumulative weight(≤ v) ≥ half the total — the inventory-style
    * "median unit price weighted by units sold", where `percentile`
    * over raw rows would need the weights exploded into copies.
    *
    * Integer-exact throughout: values and weights are integral, the
    * half-total comparison is cross-multiplied (2·cum ≥ total), and no
    * interpolation ever happens — so the SQL twin (cumulative window
    * over the same pre-aggregate) matches bit-for-bit.
    *
    * Scale: the input collapses FIRST to one row per (group, value)
    * with a map-side partial sum — the window then runs over the
    * collapsed table (cardinality = distinct values per group, not
    * rows), and the closing min-aggregate reuses the window's
    * group partitioning (no extra exchange).
    *
    * @param valInt integer-valued expression (e.g. cents)
    * @param weightInt integer weight expression (rows with weight ≤ 0
    *   or NULL value/weight are dropped)
    * @return (groupCols..., w_median, total_w, n_values) */
  def weightedMedian(df: DataFrame, groupCols: Seq[String],
      valInt: Column, weightInt: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val perValue = df
      .select((g ++ Seq(valInt.cast("long").as("__v"),
        weightInt.cast("long").as("__w"))): _*)
      .filter(col("__v").isNotNull && col("__w") > 0)
      .groupBy((g :+ col("__v")): _*)
      .agg(sum(col("__w")).as("__w"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    perValue
      .withColumn("__cum", sum(col("__w")).over(wCum))
      .withColumn("__tot", sum(col("__w")).over(wAll))
      .withColumn("__nv", count(lit(1)).over(wAll))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(g: _*)
      .agg(min(col("__v")).as("w_median"),
        first(col("__tot")).as("total_w"),
        first(col("__nv")).as("n_values"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic per group: D = max over
    * values of |F_A(v) − F_B(v)|, the workhorse drift test between two
    * cohorts of the same measure (status flags, time slices, A/B arms).
    *
    * Integer-exact core: the max runs over |cumA·n_B − cumB·n_A| — the
    * cross-multiplied ECDF gap, a pure integer (decimal-widened so
    * petabyte-scale group counts can't overflow) — and only the final
    * report divides by n_A·n_B. Ties and interleaving need no care:
    * both ECDFs step together on the collapsed per-value table.
    *
    * Scale: like [[weightedMedian]], rows collapse FIRST to one row per
    * (group, value) with both side-counts in the same map-side pass;
    * the cumulative window and the closing max reuse that partitioning.
    *
    * @param valInt integer-valued expression (NULLs dropped)
    * @param inSampleA boolean expression splitting the two samples
    * @return (groupCols..., n_a, n_b, ks_d); groups missing a side are
    *   omitted (D is undefined) */
  def ksTest(df: DataFrame, groupCols: Seq[String], valInt: Column,
      inSampleA: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val perValue = df
      .select((g ++ Seq(valInt.cast("long").as("__v"),
        when(inSampleA, 1L).otherwise(0L).as("__a"),
        when(inSampleA, 0L).otherwise(1L).as("__b"))): _*)
      .filter(col("__v").isNotNull)
      .groupBy((g :+ col("__v")): _*)
      .agg(sum(col("__a")).as("__ca"), sum(col("__b")).as("__cb"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(g: _*)
    perValue
      .withColumn("__fa", sum(col("__ca")).over(wCum))
      .withColumn("__fb", sum(col("__cb")).over(wCum))
      .withColumn("__na", sum(col("__ca")).over(wAll))
      .withColumn("__nb", sum(col("__cb")).over(wAll))
      .filter(col("__na") > 0 && col("__nb") > 0)
      .groupBy(g: _*)
      .agg(
        max(abs(col("__fa").cast("decimal(38,0)") * col("__nb") -
          col("__fb").cast("decimal(38,0)") * col("__na"))).as("__num"),
        first(col("__na")).as("n_a"), first(col("__nb")).as("n_b"))
      .withColumn("ks_d", round(col("__num").cast("double") /
        (col("n_a").cast("double") * col("n_b").cast("double")), 6))
      .drop("__num")
  }

  /** Exact Gini coefficient per group over integer-valued rows — the
    * concentration measure for spend, tokens-per-document, degree
    * distributions: G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx) with x
    * ascending, i 1-based.
    *
    * Deterministic despite ties: within a tie block the values are
    * equal, so Σ i·x over the block depends only on the SET of
    * positions — any row_number tie-break yields the same sum.
    *
    * Numerics: rank-weighted sums widen to decimal(38,0) (i·x can pass
    * 2⁶³ long before n does); one double division at the end, NULL when
    * Σx = 0 (G undefined). The rank window and the closing aggregate
    * share one hash partitioning on the group key.
    *
    * @param valInt integer-valued expression (NULLs dropped; negatives
    *   allowed but make G exceed [0,1] as usual)
    * @return (groupCols..., n, total, gini) */
  def gini(df: DataFrame, groupCols: Seq[String], valInt: Column)
      : DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val wRank = Window.partitionBy(g: _*).orderBy(col("__x"))
    df.select((g :+ valInt.cast("long").as("__x")): _*)
      .filter(col("__x").isNotNull)
      .withColumn("__i", row_number().over(wRank))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("total"),
        sum(col("__i").cast("decimal(38,0)") * col("__x")).as("__six"))
      .withColumn("gini", when(col("total") =!= 0,
        round((lit(2).cast("decimal(38,0)") * col("__six") -
          (col("n").cast("decimal(38,0)") + 1) * col("total"))
          .cast("double") /
          (col("n").cast("double") * col("total").cast("double")), 6)))
      .drop("__six")
  }

  /** Mutual information (in bits) between two categorical columns —
    * the model-free dependence screen completing the [[chiSquare]] /
    * [[woeIv]] trio: MI = Σ_cells P(x,y)·log₂(P(x,y)/(P(x)P(y))).
    *
    * Order-safe transcendentals: each cell's contribution is a single
    * fixed-order double (counts widened to decimal first), then
    * ROUNDED to 9 decimals and summed as decimal(38,9) — decimal
    * addition is exact and commutative, so the total is independent of
    * partitioning even though log₂ is irrational; the final /N rounds
    * to 6 (well inside the 9-decimal cell precision).
    *
    * Scale: one hash aggregate over the rows builds the contingency
    * cell table; marginals, totals, and the closing sum all run on
    * that (levels_x × levels_y)-sized table — the fact table is read
    * once and shuffled once, keyed by the cell.
    *
    * @return single row (n, levels_x, levels_y, mi_bits) */
  def mutualInfo(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val cells = df.select(xCol.as("__x"), yCol.as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .groupBy("__x", "__y").agg(count(lit(1)).as("c_xy"))
    val mx = cells.groupBy("__x").agg(sum("c_xy").as("c_x"))
    val my = cells.groupBy("__y").agg(sum("c_xy").as("c_y"))
    val tot = cells.agg(sum("c_xy").as("__n"),
      count(lit(1)).as("__cells"))
    val term = round(col("c_xy").cast("double") * log2(
      (col("c_xy").cast("decimal(38,0)") * col("__n")).cast("double") /
        (col("c_x").cast("decimal(38,0)") * col("c_y")).cast("double")),
      9).cast("decimal(38,9)")
    cells.join(mx, "__x").join(my, "__y").crossJoin(broadcast(tot))
      .agg(first(col("__n")).as("n"),
        countDistinct(col("__x")).as("levels_x"),
        countDistinct(col("__y")).as("levels_y"),
        sum(term).as("__mi_sum"))
      .withColumn("mi_bits", round(col("__mi_sum").cast("double") /
        col("n").cast("double"), 6))
      .drop("__mi_sum")
  }

  /** Chi-square contingency table for two categorical columns: per
    * cell, observed count, expected count under independence
    * (rowTotal·colTotal/N), and the chi-square contribution
    * (obs−exp)²/exp — the categorical-association screen (is segment
    * independent of order priority?) whose per-cell contributions also
    * localize WHERE the dependence lives.
    *
    * Plan shape: ONE aggregate over the input rows (the contingency
    * cells — cardinality |A|×|B|, tiny); marginals re-aggregate the
    * cell table, never the input, and join back broadcast-size. All
    * counts are exact longs; expected/contrib are fixed-order double
    * expressions over them (single division each), so `round(…, 6)`
    * reproduces cross-engine. The statistic itself is the sum of
    * `contrib` — left to the caller/driver because a float sum over an
    * unordered tiny table is the one engine-order-dependent step.
    *
    * The grid is the full marginal cross product, INCLUDING unobserved
    * cells (cnt = 0, contrib = expected) — dropping them silently
    * understates the statistic, and a sparse contingency table is
    * exactly when that matters.
    *
    * @return (a, b, cnt, expected, contrib) — one row per cell of
    *   observed-A × observed-B */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("cnt"))
      .persist() // 3 readers: marginals ×2 + the closing join
    val rowTot = cells.groupBy("a").agg(sum("cnt").as("rt"))
    val colTot = cells.groupBy("b").agg(sum("cnt").as("ct"))
    val n = cells.agg(sum("cnt").as("n"))
    val exp6 = round((col("rt") * col("ct")).cast("double") / col("n"), 6)
    // (obs − exp)² / exp with exp UNROUNDED inside — identical textual
    // formula on the oracle side; round only the reported numbers
    val rawExp = (col("rt") * col("ct")).cast("double") / col("n")
    val obs = coalesce(col("cnt"), lit(0L))
    val contrib6 = round((obs - rawExp) * (obs - rawExp) / rawExp, 6)
    rowTot.crossJoin(colTot) // |A|×|B| grid — marginal tables are tiny
      .join(cells, Seq("a", "b"), "left")
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), obs.as("cnt"),
        exp6.as("expected"), contrib6.as("contrib"))
  }

  /** Weight-of-evidence / information-value report — the classic
    * credit-scoring screen for how well a categorical (or pre-binned)
    * feature separates a binary label:
    * `woe_b = ln((pos_b/P) / (neg_b/N))`,
    * `iv_b = (pos_b/P − neg_b/N) · woe_b`, IV = Σ_b iv_b.
    *
    * One hash-aggregate pass over the rows (per-bin conditional
    * counts), the scalar totals attach by broadcast cross join — the
    * chiSquare shape minus the grid. The total IV is the caller's tiny
    * sum of `iv` (engine-order-dependent float fold, same stance as
    * chiSquare's statistic).
    *
    * Numerics: counts are exact longs; `pos·N` / `neg·P` widen to
    * decimal(38,0) before multiplying (exact far past 2^63) and divide
    * once inside the ln — a
    * fixed-order double expression both engines evaluate identically
    * (`scale` rounding absorbs the ln ulp). A bin with a zero side has
    * undefined WOE → NULL woe/iv (report it, don't smooth silently).
    *
    * @param positive boolean expression marking the positive class
    * @return (bin, n_pos, n_neg, woe, iv) — one row per observed bin */
  def woeIv(df: DataFrame, binCol: Column, positive: Column,
      scale: Int = 6): DataFrame =
    woeIvFromBins(df.groupBy(binCol.as("bin"))
      .agg(sum(when(positive, 1L).otherwise(0L)).as("n_pos"),
        sum(when(positive, 0L).otherwise(1L)).as("n_neg")), scale)

  /** [[woeIv]]'s closing stage over an already-binned count table
    * (`bin`, `n_pos`, `n_neg`) — public so pre-aggregated callers
    * (the streaming drift monitor folds per-batch bin counts first)
    * reuse the same totals/woe/iv arithmetic verbatim. */
  def woeIvFromBins(bins: DataFrame, scale: Int = 6): DataFrame = {
    val tot = bins.agg(sum("n_pos").as("p"), sum("n_neg").as("n"))
    // cross-products widen to decimal BEFORE multiplying: bin×total
    // passes 2^63 around 2e9×5e9 rows, where a long product would
    // throw under ANSI (and the HUGEINT oracle twin would not)
    val woeRaw = log(
      (col("n_pos").cast("decimal(38,0)") * col("n")).cast("double") /
        (col("n_neg").cast("decimal(38,0)") * col("p")).cast("double"))
    val ivRaw = (col("n_pos").cast("double") / col("p").cast("double") -
      col("n_neg").cast("double") / col("n").cast("double")) * woeRaw
    bins.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(woeRaw, scale)).as("woe"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(ivRaw, scale)).as("iv"))
  }

  /** [[psi]] over pre-aggregated per-bin cohort counts
    * (`bin`, `n_a`, `n_b`) — the drift-report shape when one side is a
    * stored reference profile rather than raw rows. */
  def psiFromCounts(bins: DataFrame): DataFrame =
    woeIvFromBins(bins.select(col("bin"), col("n_a").as("n_pos"),
      col("n_b").as("n_neg")))
      .select(col("bin"), col("n_pos").as("n_a"),
        col("n_neg").as("n_b"), col("iv").as("psi_term"))

  private def pairs(names: Seq[String]): Seq[(String, String)] =
    for {
      i <- names.indices
      j <- (i + 1) until names.size
    } yield (names(i), names(j))

  /** Calibration (reliability) report for a scored binary outcome:
    * bucket the integer-quantized score into fixed-width bins and
    * report, per bin, the support, the positive count, the mean score,
    * and the observed positive rate — the table behind a reliability
    * diagram, and the standard "is the model's confidence honest"
    * check next to [[auc]]'s ranking quality.
    *
    * Exactness: bin = FLOOR-division of the already-integer score —
    * Spark's `DIV` truncates toward zero while SQL `//` floors, so
    * negatives are floored explicitly via the pmod adjustment; counts
    * and score sums are exact longs, and the two closing divisions are
    * one double op each. ONE hash aggregate over the rows — no sort,
    * no window, broadcast-nothing.
    *
    * @param positive  boolean column — the true outcome
    * @param scoreQ    integer-quantized score (the q96 discipline)
    * @param binWidth  bin width in score units
    * @param scale     score units per 1.0 (for the mean_score report)
    * @return (bin, n, n_pos, mean_score, pos_rate), one row per
    *   non-empty bin; bin = floor(score/binWidth). */
  def calibration(df: DataFrame, positive: Column, scoreQ: Column,
      binWidth: Long, scale: Double): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    require(scale > 0, s"scale must be > 0, got $scale")
    df.select(positive.cast("int").as("pos"), scoreQ.as("sq"))
      .groupBy(expr(s"(sq - pmod(sq, $binWidth)) DIV $binWidth").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("pos")).cast("long").as("n_pos"),
        sum(col("sq")).as("__ssum"))
      .withColumn("mean_score",
        round(col("__ssum").cast("double") / col("n") / lit(scale), 6))
      .withColumn("pos_rate",
        round(col("n_pos").cast("double") / col("n"), 6))
      .drop("__ssum")
  }

  /** Nearest-centroid classification report over a labeled embedding
    * table: fit per-label mean centroids, assign every vector to its
    * closest centroid (squared L2), and return the confusion matrix —
    * the cheapest "are these embeddings linearly separable by label"
    * probe, and the evaluation twin of [[KMeans]] (fixed centroids =
    * one Lloyd assignment step).
    *
    * Exactness: components quantize to round(v·1e6) longs, so the
    * per-(label, pos) sums are exact integers and each centroid
    * component is ONE double division; per-position distance terms are
    * quantized to round(diff²·1e12) longs and summed as exact integers
    * (order-free; components ≲ 1 keep the picometer-scaled sum far
    * inside long range — and far faster than a decimal sum, which
    * Spark runs on BigDecimal above 18 digits of precision), and the
    * argmin orders by (round(d2, 6), label) — knife-edge ties break
    * identically in any engine.
    *
    * Scale shape: the position explode feeds one (label, pos) hash
    * aggregate (tiny output: labels × dims — broadcasts back), the
    * distance probe is a broadcast equi-join on pos followed by one
    * (id, label) aggregate, and the argmin + confusion rollup
    * re-aggregate that. Vectors shuffle once, as (id, pos) terms; no
    * driver-side centroid collect, no literal-expression codegen blowup
    * at high label × dim counts.
    *
    * @return (label, pred, n) — true label, predicted label, count. */
  def nearestCentroid(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    // the exploded (id, label, pos, vq) table feeds both the centroid
    // fit and the distance probe — persist or the vector scan runs twice
    val pe = emb.select(col(idCol).as("id"),
        col(labelCol).as("label"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "v")))
      .select(col("id"), col("label"), col("pos"),
        round(col("v") * 1e6).cast("long").as("vq"))
      .persist()
    val cents = pe.groupBy(col("label").as("clabel"), col("pos"))
      .agg((sum(col("vq")).cast("double") /
        (count(lit(1)).cast("double") * 1e6)).as("c"))
    // explicit diff*diff, never pow(x, 2) — Math.pow is not guaranteed
    // bit-identical to multiplication across engines
    val diff = col("vq").cast("double") / lit(1e6) - col("c")
    val term = round(diff * diff * lit(1e12)).cast("long")
    val d2 = pe.join(broadcast(cents), "pos")
      .groupBy(col("id"), col("label"), col("clabel"))
      .agg(round(sum(term).cast("double") / lit(1e12), 6).as("d2"))
    d2.groupBy(col("id"), col("label"))
      .agg(min(struct(col("d2"), col("clabel"))).as("best"))
      .groupBy(col("label"), col("best.clabel").as("pred"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-class precision/recall/F1 from a confusion matrix — the
    * classification report closing the eval set (AUC q96, AP q205,
    * nDCG q207 rank scores; this scores hard predictions, e.g.
    * [[nearestCentroid]]'s confusion output):
    *
    *   precision = tp / n_pred,  recall = tp / n_true,
    *   f1 = 2·tp / (n_true + n_pred)
    *
    * — the tp-identity form of F1: ONE division of exact integers
    * instead of composing two already-divided floats (engine-stable
    * without intermediate rounding). Classes appearing only as a
    * label or only as a prediction still get a row (full outer);
    * zero denominators report NULL, never an ANSI divide error.
    *
    * Scale shape: the input is already a confusion MATRIX (≤ classes²
    * rows), so everything here is aggregate arithmetic on a tiny
    * table — the heavy lifting happened upstream.
    *
    * @param confusion (`label`, `pred`, `n`) rows
    * @return (class, n_true, n_pred, tp, prec, rec, f1) — `prec`/`rec`
    *   abbreviated because PRECISION is a SQL type keyword. */
  def f1Report(confusion: DataFrame, scale: Int = 6): DataFrame = {
    val t = confusion.groupBy(col("label").as("class"))
      .agg(sum(col("n")).as("n_true"))
    val p = confusion.groupBy(col("pred").as("class"))
      .agg(sum(col("n")).as("n_pred"))
    // aggregate the diagonal too — a confusion table unioned across
    // shards may carry duplicate (label, pred) rows, and an
    // unaggregated tp would fan the left join out
    val tp = confusion.filter(col("label") === col("pred"))
      .groupBy(col("label").as("class")).agg(sum(col("n")).as("tp"))
    def ratio(num: Column, den: Column) =
      when(den > 0, round(num.cast("double") / den.cast("double"), scale))
    t.join(p, Seq("class"), "full_outer")
      .join(tp, Seq("class"), "left")
      .select(col("class"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .select(col("class"), col("n_true"), col("n_pred"), col("tp"),
        ratio(col("tp"), col("n_pred")).as("prec"),
        ratio(col("tp"), col("n_true")).as("rec"),
        ratio(col("tp") * 2, col("n_true") + col("n_pred")).as("f1"))
  }

  /** Gain/lift table over score bins — the campaign-targeting /
    * model-triage eval: rank everything by score, cut into `nBins`
    * equal-width rank bins, report per-bin and cumulative positive
    * capture and lift. Binning is the explicit rank formula
    * `bin = (rnk−1)·nBins DIV N + 1` over the
    * [[GlobalIndex.rowNumbers]] ranking — NOT SQL `ntile`, whose
    * remainder-spreading the two engines would have to agree on, and
    * NOT a one-task global sort (rowNumbers range-partitions). The
    * closing cumulative window runs over nBins rows only.
    *
    * @param positive boolean column (NULL counts negative)
    * @param score    integral score (quantize floats first);
    *                 NULL-score rows excluded (the [[auc]] rule)
    * @param tie      integral tiebreaker making (score, tie) a total
    *                 order
    * @return (bin, n, pos, cum_pos, capture, lift) — capture =
    *   cum_pos/total_pos, lift = (pos/n)/(P/N), round(`scale`); lift
    *   NULL when the population has no positives. */
  def liftTable(df: DataFrame, positive: Column, score: Column,
      tie: Column, nBins: Int = 10, scale: Int = 6): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val base = df.select(score.as("__s"), tie.as("__t"),
        when(positive, 1L).otherwise(0L).as("__y"))
      .filter(col("__s").isNotNull)
      .withColumn("__negs", -col("__s"))
    val ranked = GlobalIndex.rowNumbers(base, Seq("__negs", "__t"), "__r")
    val n = ranked.count() // rowNumbers is already eager; this is cheap
    require(n > 0, "no scored rows")
    val perBin = ranked
      .groupBy(expr(s"(__r - 1L) * ${nBins}L DIV ${n}L + 1L").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = perBin.agg(sum(col("n")).as("tn"), sum(col("pos")).as("tp"))
    perBin.crossJoin(broadcast(tot))
      .withColumn("cum_pos", sum(col("pos")).over(w))
      .select(col("bin"), col("n"), col("pos"), col("cum_pos"),
        when(col("tp") > 0, round(col("cum_pos").cast("double") /
          col("tp").cast("double"), scale)).as("capture"),
        when(col("tp") > 0, round(
          (col("pos").cast("double") / col("n").cast("double")) /
            (col("tp").cast("double") / col("tn").cast("double")), scale))
          .as("lift"))
  }

  /** Brier score — the proper scoring rule for PROBABILITY forecasts,
    * completing the eval set's third leg (rank-based AUC/AP/nDCG score
    * ordering, F1/MCC score hard labels, Brier scores the calibration
    * AND refinement of the probabilities themselves):
    * mean((p − y)²), lower better, 0.25 = the uninformed coin.
    *
    * ONE aggregate pass; each squared residual rounds at 9 and
    * decimal-sums (fold-order-free), one closing division. NULL
    * probabilities are excluded (unscorable, the [[auc]] rule).
    *
    * @return one row (n, brier). */
  def brierScore(df: DataFrame, prob: Column, positive: Column,
      scale: Int = 6): DataFrame =
    df.select(prob.cast("double").as("__p"),
        when(positive, 1.0).otherwise(0.0).as("__y"))
      .filter(col("__p").isNotNull)
      .select(round((col("__p") - col("__y")) * (col("__p") - col("__y")),
        9).cast("decimal(38,9)").as("__t"))
      .agg(count(lit(1)).as("n"), sum(col("__t")).as("__s"))
      .select(col("n"),
        when(col("n") > 0, round(col("__s").cast("double") /
          col("n").cast("double"), scale)).as("brier"))

  /** Matthews correlation coefficient from a confusion matrix, for a
    * designated positive class — the single balanced scalar beside
    * [[f1Report]]'s per-class rows (robust to class imbalance, which
    * accuracy and F1 are not):
    *
    *   MCC = (tp·tn − fp·fn) / √((tp+fp)(tp+fn)(tn+fp)(tn+fn))
    *
    * All four cells are exact integer sums off the (label, pred, n)
    * matrix; numerator and the four denominator factors compute in
    * decimal (n⁴ fits decimal(38,0) out to ~10⁹ rows), one cast to
    * double, one sqrt, one division. A zero factor (a degenerate
    * margin) reports NULL, the convention for an undefined
    * correlation.
    *
    * @return one row (tp, fp, fn, tn, mcc). */
  def mcc(confusion: DataFrame, positive: Column,
      scale: Int = 6): DataFrame = {
    val dec = "decimal(38,0)"
    def cell(c: Column) = coalesce(sum(when(c, col("n"))), lit(0L))
    val labP = col("label") === positive
    val predP = col("pred") === positive
    val cells = confusion.agg(
      cell(labP && predP).as("tp"),
      cell(!labP && predP).as("fp"),
      cell(labP && !predP).as("fn"),
      cell(!labP && !predP).as("tn"))
    val num = col("tp").cast(dec) * col("tn").cast(dec) -
      col("fp").cast(dec) * col("fn").cast(dec)
    val den = (col("tp") + col("fp")).cast(dec) *
      (col("tp") + col("fn")).cast(dec) *
      (col("tn") + col("fp")).cast(dec) *
      (col("tn") + col("fn")).cast(dec)
    cells.select(col("tp"), col("fp"), col("fn"), col("tn"),
      when(den > 0, round(num.cast("double") /
        sqrt(den.cast("double")), scale)).as("mcc"))
  }

  /** CUPED adjusted means (Deng et al. 2013, "Improving the
    * Sensitivity of Online Controlled Experiments") — the standard
    * experimentation variance-reduction: per experiment unit a
    * pre-period covariate x and the experiment metric y,
    *
    *   θ = Σ(x−x̄)(y−ȳ) / Σ(x−x̄)²       (pooled, all units)
    *   ȳ_adj(variant) = ȳ_v − θ·(x̄_v − x̄)
    *
    * Shape: ONE global moment aggregate (n, Σx, Σy, Σxy, Σx² — exact
    * decimals, the q78/q87 moment-sum discipline) broadcast onto the
    * per-variant aggregate; θ and the adjustment are fixed-order
    * double expressions off exact integers. Zero covariate variance
    * (den = 0) degrades to θ = 0, i.e. the unadjusted mean — never a
    * divide error.
    *
    * @param x/@param y integral (cents-quantized) per-unit metrics
    * @return (variant, n, y_mean, y_adj) — means in input units,
    *   round(`scale`). */
  def cuped(df: DataFrame, variantCol: Column, x: Column, y: Column,
      scale: Int = 6): DataFrame = {
    val base = df.select(variantCol.as("variant"),
      x.cast("long").as("x"), y.cast("long").as("y"))
      .persist() // two readers: the global moments and the variant agg
    val dec = "decimal(38,0)"
    // cast BEFORE multiplying — long x*y wraps (or ANSI-throws) past
    // 2^63 while the oracle's HUGEINT product stays exact
    val g = base.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
      sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"))
    val v = base.groupBy("variant").agg(count(lit(1)).as("nv"),
      sum(col("x")).as("sxv"), sum(col("y")).as("syv"))
    val num = col("n").cast(dec) * col("sxy") -
      col("sx").cast(dec) * col("sy").cast(dec)
    val den = col("n").cast(dec) * col("sxx") -
      col("sx").cast(dec) * col("sx").cast(dec)
    val theta = when(col("__den") =!= 0,
      col("__num").cast("double") / col("__den").cast("double"))
      .otherwise(lit(0.0))
    val xbar = col("sx").cast("double") / col("n").cast("double")
    val xbarV = col("sxv").cast("double") / col("nv").cast("double")
    val ybarV = col("syv").cast("double") / col("nv").cast("double")
    v.crossJoin(broadcast(g))
      .withColumn("__num", num).withColumn("__den", den)
      .select(col("variant"), col("nv").as("n"),
        round(ybarV, scale).as("y_mean"),
        round(ybarV - theta * (xbarV - xbar), scale).as("y_adj"))
  }

  /** Delete-one-bucket jackknife standard error of a ratio metric —
    * the experimentation CI machinery for metrics that are ratios of
    * sums (revenue per click, tokens per doc), where per-unit variance
    * formulas are wrong because numerator and denominator co-vary:
    *
    *   R = S/T,  R_i = (S − s_i)/(T − t_i)  over N buckets
    *   se² = (N−1)/N · Σ(R_i − R̄)²
    *
    * Buckets are the caller's deterministic unit hash — delete-one-
    * BUCKET (block jackknife) is the distributed form: per-bucket sums
    * are one aggregate, the N leave-one-out replicates live on N rows.
    * Buckets whose removal empties the denominator are excluded from
    * the replicate set (documented; N reflects it). When EVERY bucket
    * is excluded the one-row contract still holds: (n_buckets = 0,
    * the overall ratio, se_jk NULL) — callers doing .head never crash.
    *
    * Numerics: s_i/t_i/S/T exact longs; each R_i is one division
    * (identical doubles both engines) rounded at 9 and decimal-summed
    * for R̄ (the q139 discipline); squared deviations round(12) then
    * decimal-sum; one closing multiply + sqrt.
    *
    * @return one row (n_buckets, ratio, se_jk), round(`scale`). */
  def jackknifeRatio(df: DataFrame, bucketCol: Column, num: Column,
      den: Column, scale: Int = 6): DataFrame = {
    val perBucket = df
      .select(bucketCol.as("b"), num.cast("long").as("x"),
        den.cast("long").as("y"))
      .groupBy("b").agg(sum(col("x")).as("si"), sum(col("y")).as("ti"))
      .persist() // N tiny rows, TWO readers — else the input scans twice
    val tot = perBucket.agg(sum(col("si")).as("s"), sum(col("ti")).as("t"))
    val reps = perBucket.crossJoin(broadcast(tot))
      .filter(col("t") - col("ti") =!= 0)
      .select(col("s"), col("t"),
        round((col("s") - col("si")).cast("double") /
          (col("t") - col("ti")).cast("double"), 9).as("ri"))
      .persist()
    val rbar = reps
      .agg(first(col("s")).as("s"), first(col("t")).as("t"),
        count(lit(1)).as("nb"),
        sum(col("ri").cast("decimal(38,9)")).as("srs"))
      .select(col("s"), col("t"), col("nb"),
        (col("srs").cast("double") / col("nb").cast("double")).as("rbar"))
    val core = reps.crossJoin(broadcast(rbar.drop("s", "t")))
      .select(col("s"), col("t"), col("nb"),
        round((col("ri") - col("rbar")) * (col("ri") - col("rbar")), 12)
          .cast("decimal(38,12)").as("d2"))
      .groupBy(col("s"), col("t"), col("nb"))
      .agg(sum(col("d2")).as("ssd"))
      .select(col("nb").as("n_buckets"),
        when(col("t") =!= 0,
          round(col("s").cast("double") / col("t").cast("double"), scale))
          .as("ratio"),
        round(sqrt((col("nb") - 1).cast("double") /
          col("nb").cast("double") * col("ssd").cast("double")), scale)
          .as("se_jk"))
    // Degenerate input — EVERY bucket's removal empties the denominator
    // (e.g. a single bucket holds all the clicks) → zero replicates, so
    // `core` is empty. Keep the documented one-row contract anyway:
    // n_buckets = 0, the overall ratio from `tot`, NULL se_jk.
    val fallback = tot.select(lit(0L).as("n_buckets"),
      when(col("t") =!= 0,
        round(col("s").cast("double") / col("t").cast("double"), scale))
        .as("ratio"),
      lit(null).cast("double").as("se_jk"))
    core.unionByName(fallback.join(core, lit(true), "left_anti"))
  }

  /** Per-group two-feature OLS — y = b0 + b1·x1 + b2·x2 by closed-form
    * 2×2 normal equations (Cramer's rule on centered moments): the
    * regression (q78) pattern one matrix rank higher. Inputs must be
    * integral (cast to long); first-level moments accumulate as
    * decimal(38,0) (exact, order-free), the five centered terms cast
    * to double ONCE, and every second-level product/ratio is a
    * fixed-order IEEE expression — identical in any engine, so the
    * coefficients are oracle-exact after round(6). Degenerate groups
    * (det = 0: collinear or constant features) report NULL
    * coefficients rather than ±inf/NaN.
    *
    * Scale note: second-level arithmetic in double (not decimal) is
    * what keeps this safe at 100 TB — centered-moment PRODUCTS exceed
    * decimal(38,0) around n ≈ 1e10 rows/group, while the double path
    * only loses precision it was going to round away anyway.
    *
    * @return (keyCols*, n, b1, b2, b0) rounded to 6 decimals */
  def ols2(df: DataFrame, keyCols: Seq[String], x1: Column, x2: Column,
      y: Column): DataFrame = {
    val z = df.select(keyCols.map(col) ++ Seq(
      x1.cast("long").as("x1"), x2.cast("long").as("x2"),
      y.cast("long").as("y")): _*)
    val a = z.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col("x1").cast("decimal(38,0)")).as("s1"),
      sum(col("x2").cast("decimal(38,0)")).as("s2"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum((col("x1") * col("x1")).cast("decimal(38,0)")).as("s11"),
      sum((col("x2") * col("x2")).cast("decimal(38,0)")).as("s22"),
      sum((col("x1") * col("x2")).cast("decimal(38,0)")).as("s12"),
      sum((col("x1") * col("y")).cast("decimal(38,0)")).as("s1y"),
      sum((col("x2") * col("y")).cast("decimal(38,0)")).as("s2y"))
    def ctr(sab: String, sa: String, sb: String) =
      (col("n") * col(sab) - col(sa) * col(sb)).cast("double")
    val c11 = ctr("s11", "s1", "s1"); val c22 = ctr("s22", "s2", "s2")
    val c12 = ctr("s12", "s1", "s2")
    val c1y = ctr("s1y", "s1", "sy"); val c2y = ctr("s2y", "s2", "sy")
    val det = c11 * c22 - c12 * c12
    val b1 = (c22 * c1y - c12 * c2y) / det
    val b2 = (c11 * c2y - c12 * c1y) / det
    val b0 = (col("sy").cast("double") - b1 * col("s1").cast("double")
      - b2 * col("s2").cast("double")) / col("n").cast("double")
    a.select(keyCols.map(col) ++ Seq(col("n"),
      when(det =!= 0.0, round(b1, 6)).as("b1"),
      when(det =!= 0.0, round(b2, 6)).as("b2"),
      when(det =!= 0.0, round(b0, 6)).as("b0")): _*)
  }

  /** One-way ANOVA F test across the levels of a categorical factor —
    * [[welchT]]'s k-group generalization: does ANY level's mean differ?
    * F = (SSB/(k−1)) / (SSW/(n−k)).
    *
    * Exactness: group means are ONE double division each; per-row
    * (x−m_g)² and per-group n_g·(m_g−m)² round to integer units²
    * (error ≤ 0.5 per term, identical in any engine) and sum as
    * decimal(38,0) — order-free — so F is a single fixed-order double
    * expression over two exact integers and two counts.
    *
    * REQUIREMENT, not a suggestion: `valInt` must be pre-scaled so the
    * unit² quantization is negligible against the spread — per-term
    * error is ≤ 0.5 units², so typical centered squares must be ≫ 1
    * (values spanning only a few units can shift F by several percent;
    * cents or milli-units restore exactness — the same log-term
    * discipline [[theilIndex]] documents).
    *
    * Shape: one grouped moment pass, the k-row group table broadcasts
    * back onto the rows for the SSW pass, the global scalars attach by
    * broadcast cross join — the [[madOutliers]] two-pass shape.
    *
    * @param factor grouping column; @param valInt integer values.
    * @return one row: (k, n, f_stat) — NULL when k < 2, n ≤ k, or
    *   SSW = 0. (SSB/SSW stay internal: they are decimal(38,0)
    *   integers whose report form would need its own cross-engine
    *   contract; F is the decision number.) */
  def anovaF(df: DataFrame, factor: Column, valInt: Column): DataFrame = {
    val o = df.select(factor.as("__g"), valInt.cast("long").as("__x"))
      .filter(col("__g").isNotNull && col("__x").isNotNull)
      .persist() // two passes: group moments, then centered squares
    val grp = o.groupBy(col("__g"))
      .agg(count(lit(1)).as("__ng"),
        sum(col("__x").cast("decimal(38,0)")).as("__sg"))
      .withColumn("__mg",
        col("__sg").cast("double") / col("__ng").cast("double"))
    val tot = grp.agg(sum(col("__ng")).as("n"),
      count(lit(1)).as("k"), sum(col("__sg")).as("__s"))
      .withColumn("__m", col("__s").cast("double") / col("n").cast("double"))
    val ssw = o.join(broadcast(grp.select(col("__g"), col("__mg"))), "__g")
      .select(round((col("__x") - col("__mg")) *
        (col("__x") - col("__mg"))).cast("decimal(38,0)").as("__t"))
      .agg(sum(col("__t")).as("ssw"))
    val ssb = grp.crossJoin(broadcast(tot.select(col("__m"))))
      .select((col("__ng").cast("decimal(38,0)") *
        round((col("__mg") - col("__m")) * (col("__mg") - col("__m")))
          .cast("decimal(38,0)")).as("__b"))
      .agg(sum(col("__b")).as("ssb"))
    val f = (col("ssb").cast("double") / (col("k").cast("double") - 1.0)) /
      (col("ssw").cast("double") / (col("n").cast("double") -
        col("k").cast("double")))
    tot.select(col("k"), col("n"))
      .crossJoin(ssb).crossJoin(ssw)
      .select(col("k"), col("n"),
        when(col("k") > 1 && col("n") > col("k") &&
          col("ssw").cast("double") > 0.0, round(f, 6)).as("f_stat"))
  }

  /** Spearman rank correlation per group — Pearson on the
    * tie-averaged ranks, the monotone-association measure that ignores
    * the marginal distributions ([[corrMatrix]] is its linear
    * sibling). Average ranks of a tie block are half-integers, so they
    * carry ×2 (rank2 = 2·min_rank + t − 1 — always integral): the
    * moment sums stay decimal-exact and the ×2 factors cancel in r.
    *
    * Shape: two rank windows (one per variable) + one tie-count window
    * each, all partitioned by the group key — one exchange; then the
    * corrMatrix moment aggregate.
    *
    * @return (groupCols..., n, spearman) — NULL on zero variance. */
  def spearman(df: DataFrame, groupCols: Seq[String], xInt: Column,
      yInt: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val o = df.select((g ++ Seq(xInt.cast("long").as("__x"),
      yInt.cast("long").as("__y"))): _*)
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    def rank2(c: String) = {
      val wr = Window.partitionBy(g: _*).orderBy(col(c))
      val wt = Window.partitionBy((g :+ col(c)): _*)
      (rank().over(wr).cast("long") * 2 + count(lit(1)).over(wt) - 1L)
    }
    val ranked = o
      .withColumn("__rx", rank2("__x").cast("decimal(38,0)"))
      .withColumn("__ry", rank2("__y").cast("decimal(38,0)"))
    val num = (col("n") * col("__sp") - col("__sx") * col("__sy"))
      .cast("double")
    val den = sqrt((col("n") * col("__sxx") -
      col("__sx") * col("__sx")).cast("double")) *
      sqrt((col("n") * col("__syy") -
        col("__sy") * col("__sy")).cast("double"))
    ranked.groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__rx")).as("__sx"), sum(col("__ry")).as("__sy"),
        sum(col("__rx") * col("__rx")).as("__sxx"),
        sum(col("__ry") * col("__ry")).as("__syy"),
        sum(col("__rx") * col("__ry")).as("__sp"))
      .withColumn("spearman", when(den =!= 0.0, round(num / den, 6)))
      .drop("__sx", "__sy", "__sxx", "__syy", "__sp")
  }

  /** Population Stability Index report between two cohorts of a
    * binned score — the industry drift monitor beside [[ksTest]]'s
    * distribution-free statistic: per bin,
    * psi_term = (p_a − p_b)·ln(p_a/p_b) with p = bin share. The total
    * PSI is the caller's tiny sum of `psi_term` (the [[chiSquare]]
    * stance: a float fold over an unordered table stays driver-side).
    *
    * The per-bin term is EXACTLY [[woeIv]]'s `iv` with the positive
    * class playing cohort A — so this is a thin delegate over that
    * machinery (same plan, same decimal-widened numerics), renamed
    * into drift vocabulary. A bin empty on either
    * side reports NULL (PSI undefined there — surface it, don't
    * epsilon-smooth silently).
    *
    * @param binExpr integer bin id (use the q149 floor-div discipline)
    * @param inCohortA boolean split
    * @return (bin, n_a, n_b, psi_term). */
  def psi(df: DataFrame, binExpr: Column, inCohortA: Column): DataFrame =
    woeIv(df, binExpr, inCohortA)
      .select(col("bin"), col("n_pos").as("n_a"),
        col("n_neg").as("n_b"), col("iv").as("psi_term"))

  /** Poisson(1) CDF thresholds F(0..7) (count 8 = the tail) — the
    * inverse-CDF ladder for [[poissonBootstrap]]'s deterministic
    * resample counts. Computed ONCE on the driver and used verbatim
    * by both the engine ladder and the printed SQL twin, so whatever
    * ulp `exp(-1)` lands on, both engines compare against the same
    * literals. */
  val PoissonCdf1: IndexedSeq[Double] = {
    val e1 = math.exp(-1.0)
    var fact = 1.0
    var acc = 0.0
    (0 to 7).map { k =>
      if (k > 0) fact *= k
      acc += e1 / fact
      acc
    }
  }

  /** Poisson bootstrap confidence band for the group mean — the
    * bootstrap that actually scales: instead of materializing B
    * resamples, every row draws a DETERMINISTIC Poisson(1) multiplicity
    * per resample from a salted hash of (id, b), so the whole band
    * costs one ×B explode + two aggregates and re-runs identically
    * (same salt ⇒ same band, the [[graft.operators.Privacy]] release
    * discipline applied to resampling).
    *
    * The band is RANK-based: resample means quantize to round(6), are
    * totally ordered by (mean, b), and the report picks the B/4, B/2,
    * 3B/4-th elements — existing values, no interpolation arithmetic
    * to diverge cross-engine. Resamples whose total weight lands at 0
    * are dropped (surfaced via n_resamples; vanishingly rare beyond
    * tiny groups — a group needs ≥ the rank indices to fill the band).
    *
    * @param idCol unique row id (drives the draw; duplicates would
    *   correlate their multiplicities)
    * @param valInt integer-valued metric (e.g. cents)
    * @param b resamples (≥ 4; ranks are b/4, b/2, 3b/4)
    * @return (groupCols..., n_resamples, boot_lo, boot_med, boot_hi).
    *
    * Granularity trade-off: the Poisson(1) multiplicities invert 16-bit
    * uniforms (1/65536 steps — the price of the 8-slots-per-digest
    * hash-cost cut above), so deep-tail multiplicities k ≥ 5 (true
    * probabilities ~3e-4 → ~1e-5) are coarsely quantized and k = 8 is
    * reachable at u ≈ 0.9999924 — a slight deterministic bias in
    * resample weights, irrelevant to quartile bands over ≥ thousands of
    * rows. If tighter tails ever matter, widen to 32-bit slots (8 hex
    * chars, 4 per digest: 2× the hash bill, 2⁻³² steps). */
  def poissonBootstrap(df: DataFrame, groupCols: Seq[String],
      idCol: Column, valInt: Column, b: Int, salt: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(b >= 4, s"need at least 4 resamples, got $b")
    val g = groupCols.map(col)
    // one md5 per (row, resample-OCTET): each digest's 32 hex chars
    // yield eight independent 16-bit uniforms, cutting the dominant
    // hash cost 8× vs a digest per resample (measured 20 s → seconds
    // at sf0.1). The digest lands in a COLUMN before the slot explode,
    // so the substring never re-hashes.
    val octets = df
      .select((g ++ Seq(idCol.cast("long").as("__id"),
        valInt.cast("long").as("__x"))): _*)
      .filter(col("__id").isNotNull && col("__x").isNotNull)
      // the heavy work is the ×(b/8) octet fan-out with a digest + CASE
      // ladders per octet row — CPU, not IO. A small input (one parquet
      // split) would otherwise run ALL of it in a single task; this
      // narrow 3-column hash shuffle is linear in the input and buys
      // full-cluster parallelism for the digest stage (on a 100 TB
      // input with thousands of splits it is ~free either way).
      .repartition(col("__id"))
      .select((g ++ Seq(col("__id"), col("__x"),
        explode(sequence(lit(0), lit((b + 7) / 8 - 1))).as("__g"))): _*)
      .withColumn("__h", md5(concat(lit(salt), lit(":"),
        col("__id").cast("string"), lit(":"),
        col("__g").cast("string"))))
    // The inverse-CDF ladder never needs SQL arithmetic: u =
    // (h16+0.5)·2⁻¹⁶ exactly (power-of-2 scaling), so u < F_k ⟺
    // h16 ≤ T_k with T_k = the largest integer strictly below
    // F_k·65536 − 0.5, both sides exact in double. T_k is precomputed
    // here ONCE; the draws come from the native PoissonOctet kernel —
    // one interpreted pass over the digest's 32 hex chars computing all
    // 8 multiplicities (the SQL formulation, 8 substrings × a 9-deep
    // CASE each, measured ~10 µs/row ≈ 3 s of the sf0.1 bill; the
    // kernel is ~100× cheaper per row and bit-identical).
    val intBounds: Seq[Int] = PoissonCdf1.map { f =>
      val bound = f * 65536.0 - 0.5 // exact: |f*65536| < 2^17
      (if (bound == math.floor(bound)) bound.toLong - 1
       else math.floor(bound).toLong).toInt
    }
    // The 8 slots stay COLUMNS through the aggregate (one num/den sum
    // pair per slot): the old slot explode multiplied the row stream
    // ×8 (9.6M rows at sf0.1) before a hash aggregate; 16 aggregate
    // expressions over the un-exploded octet rows do the same sums
    // map-side partial, and the tiny (group, octet) sum table — not the
    // row stream — is what unpivots back to per-resample rows. Output
    // bit-identical (same uniforms, same order-free decimal addends).
    val withC = octets
      .withColumn("__cs", graft.functions.HashDrawExpressions
        .poissonOctet(col("__h"), intBounds))
      .select((g ++ Seq(col("__x"), col("__g")) ++
        (0 until 8).map(s => element_at(col("__cs"), s + 1).as(s"__c$s"))): _*)
    val sums = withC
      .groupBy((g :+ col("__g")): _*)
      .agg(
        sum((col("__c0") * col("__x")).cast("decimal(38,0)")).as("__num0"),
        (0 until 8).flatMap(s => Seq(
          if (s == 0) None
          else Some(sum((col(s"__c$s") * col("__x")).cast("decimal(38,0)"))
            .as(s"__num$s")),
          Some(sum(col(s"__c$s")).as(s"__den$s")))).flatten: _*)
    val means = sums
      .select((g ++ Seq(col("__g"),
        explode(array((0 until 8).map(s =>
          struct(lit(s).as("s"), col(s"__num$s").as("num"),
            col(s"__den$s").as("den"))): _*)).as("__p"))): _*)
      .withColumn("__b", col("__g") * 8 + col("__p.s"))
      .filter(col("__b") < b) // slots past b when 8 ∤ b: never resamples
      .filter(col("__p.den") > 0)
      .select((g ++ Seq(col("__b"),
        round(col("__p.num").cast("double") /
          col("__p.den").cast("double"), 6).as("__qm"))): _*)
    val rn = row_number().over(
      Window.partitionBy(g: _*).orderBy(col("__qm"), col("__b")))
    means.withColumn("__rn", rn)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_resamples"),
        min(when(col("__rn") === b / 4, col("__qm"))).as("boot_lo"),
        min(when(col("__rn") === b / 2, col("__qm"))).as("boot_med"),
        min(when(col("__rn") === 3 * b / 4, col("__qm"))).as("boot_hi"))
  }

  /** Theil T inequality index per group — [[gini]]'s entropy-based
    * sibling, and the one that DECOMPOSES (between-group + within-group
    * inequality add up, which Gini refuses to do):
    * T = Σᵢ (xᵢ/S)·ln(xᵢ·n/S), S = Σx. Zero when all equal,
    * ln(n) at full concentration.
    *
    * Order-safe transcendentals (the q139 discipline): each row's
    * (xᵢ/S)·ln(xᵢ·n/S) is a fixed-order double over exact integers
    * (xᵢ·n widens to decimal first), rounded to 9 decimals and summed
    * as decimal(38,9). The share form keeps every term O(1) — an
    * xᵢ·ln(…) form would carry 9-digit integer parts whose sub-1e-9
    * residue a double cannot even represent, making round(…,9)
    * engine-dependent. Rows with x ≤ 0 are dropped (ln undefined;
    * zero rows contribute 0 in the limit — but they still don't count
    * toward n, stated explicitly).
    *
    * Scale: one grouped sum pass, the tiny (group → n, S) table
    * broadcasts back onto the rows, one term aggregate — the
    * [[madOutliers]] two-pass shape.
    *
    * @param valInt positive integer-valued expression (e.g. cents)
    * @return (groupCols..., n, total, theil) rounded to 6. */
  def theilIndex(df: DataFrame, groupCols: Seq[String], valInt: Column)
      : DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val o = df.select((g :+ valInt.cast("long").as("__x")): _*)
      .filter(col("__x") > 0)
    val m = o.groupBy(g: _*)
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("total"))
    val term = round(
      (col("__x").cast("double") / col("total").cast("double")) * log(
        (col("__x").cast("decimal(38,0)") * col("n")).cast("double") /
          col("total").cast("double")), 9).cast("decimal(38,9)")
    o.join(broadcast(m), groupCols)
      .groupBy(g: _*)
      .agg(first(col("n")).as("n"), first(col("total")).as("total"),
        sum(term).as("__ts"))
      .withColumn("theil", round(col("__ts").cast("double"), 6))
      .drop("__ts")
  }

  /** Mann–Kendall trend test per group — the nonparametric "is this
    * series monotonically drifting" screen over an ordered integer
    * series: S = Σ_{i<j} sign(x_j − x_i) with the normal approximation
    * z = (S ∓ 1)/√Var(S) under the tie-corrected variance
    * 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5), plus Kendall's τ_b.
    *
    * Exactness: S, the pair count T, the tie sums, and the ×18-scaled
    * variance are all integers (variance products widen to
    * decimal(38,0) — n³ passes 2⁶³ already at n ≈ 1.6·10⁶); z and τ_b
    * are single fixed-order double expressions over them, rounded — so
    * a SQL twin matches digit-for-digit.
    *
    * Scale: pair enumeration is an equi-join on the group key filtered
    * to `t_a < t_b` — O(Σ_g n_g²) pairs. This is a test for BOUNDED
    * per-group series (daily/weekly aggregates: n ≲ 10⁴ per group, like
    * [[graft.operators.TimeSeries.acf]]'s calendar-lag stance), not for
    * raw event streams — aggregate first. `ordCol` must be unique
    * within a group (a keyed series, not a bag).
    *
    * @param valInt integer-valued expression (e.g. cents; NULLs dropped)
    * @return (groupCols..., n, s, z, tau_b); z/τ_b NULL when the
    *   variance degenerates (n < 2 or all values tied). */
  def mannKendall(df: DataFrame, groupCols: Seq[String], ordCol: String,
      valInt: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val base = df
      .select((g ++ Seq(col(ordCol).cast("long").as("__t"),
        valInt.cast("long").as("__x"))): _*)
      .filter(col("__t").isNotNull && col("__x").isNotNull)
      .persist() // three readers: both join sides + the tie aggregate
    val a = base.select((g ++ Seq(col("__t").as("__ta"),
      col("__x").as("__xa"))): _*)
    val b = base.select((g ++ Seq(col("__t").as("__tb"),
      col("__x").as("__xb"))): _*)
    val sPairs = a.join(b, groupCols)
      .filter(col("__ta") < col("__tb"))
      .groupBy(g: _*)
      .agg(sum(when(col("__xb") > col("__xa"), 1L)
        .when(col("__xb") < col("__xa"), -1L).otherwise(0L)).as("s"),
        count(lit(1)).as("__tt")) // T = n(n−1)/2 pairs, from the join
    // per-group n and the tie sums over value multiplicities t_v:
    // Σ t(t−1)(2t+5) (variance correction) and Σ t(t−1) (= 2·T_x, τ_b)
    val ties = base
      .groupBy((g :+ col("__x")): _*)
      .agg(count(lit(1)).as("__tv"))
      .groupBy(g: _*)
      .agg(sum(col("__tv")).as("n"),
        sum((col("__tv").cast("decimal(38,0)") * (col("__tv") - 1) *
          (col("__tv") * 2 + 5))).as("__tcor"),
        sum((col("__tv").cast("decimal(38,0)") * (col("__tv") - 1)))
          .as("__tx2"))
    val var18 = (col("n").cast("decimal(38,0)") * (col("n") - 1) *
      (col("n").cast("decimal(38,0)") * 2 + 5)) - col("__tcor")
    val zNum = when(col("s") > 0, col("s") - 1)
      .when(col("s") < 0, col("s") + 1).otherwise(lit(0L))
    val tauDen = sqrt((col("__tt").cast("decimal(38,0)") * 2 -
      col("__tx2")).cast("double") / 2.0) *
      sqrt(col("__tt").cast("double"))
    // anchor on `ties` (one row per group, even n = 1): a pairless
    // group has S = 0 over zero pairs and NULL statistics — the same
    // degenerate-row contract the all-tied case already gets
    ties.join(sPairs, groupCols, "left")
      .withColumn("s", coalesce(col("s"), lit(0L)))
      .withColumn("__tt", coalesce(col("__tt"), lit(0L)))
      .select((g ++ Seq(col("n"), col("s"),
        when(var18.cast("double") > 0,
          round(zNum.cast("double") /
            sqrt(var18.cast("double") / 18.0), 6)).as("z"),
        when(tauDen =!= 0.0,
          round(col("s").cast("double") / tauDen, 6)).as("tau_b"))): _*)
  }

  /** Welch's unequal-variance two-sample t report per group — the
    * parametric sibling of [[ksTest]] on the same (group, split) shape:
    * did the mean move, and with how many effective degrees of freedom?
    * t = (m_A − m_B)/√(v_A/n_A + v_B/n_B), ν by Welch–Satterthwaite.
    *
    * Numerics: per-side (n, Σx, Σx²) accumulate as decimal(38,0); the
    * sample variances, means, t, and ν are fixed-order double
    * expressions over those exact sums (one division each, no
    * intermediate re-rounding), so round(6) reproduces cross-engine.
    * ONE hash aggregate over the rows; everything after runs on the
    * group-count-sized table.
    *
    * @param valInt integer-valued expression (e.g. cents; NULLs dropped)
    * @param inSampleA boolean expression splitting the two samples
    * @return (groupCols..., n_a, n_b, mean_a, mean_b, t_stat, df) in
    *   valInt units; t/df NULL when either side has n < 2 or both
    *   variances are zero. */
  def welchT(df: DataFrame, groupCols: Seq[String], valInt: Column,
      inSampleA: Column): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val z = df
      .select((g ++ Seq(valInt.cast("long").as("__v"),
        when(inSampleA, 1L).otherwise(0L).as("__a"))): _*)
      .filter(col("__v").isNotNull)
    val d = col("__v").cast("decimal(38,0)")
    val m = z.groupBy(g: _*).agg(
      sum(col("__a")).as("n_a"),
      (count(lit(1)) - sum(col("__a"))).as("n_b"),
      sum(when(col("__a") === 1, d).otherwise(lit(0).cast("decimal(38,0)")))
        .as("__sa"),
      sum(when(col("__a") === 0, d).otherwise(lit(0).cast("decimal(38,0)")))
        .as("__sb"),
      sum(when(col("__a") === 1, d * d).otherwise(lit(0).cast("decimal(38,0)")))
        .as("__ssa"),
      sum(when(col("__a") === 0, d * d).otherwise(lit(0).cast("decimal(38,0)")))
        .as("__ssb"))
    // sample variance v = (n·Σx² − (Σx)²) / (n·(n−1)) — numerator exact
    def variance(n: Column, s: String, ss: String): Column =
      (n.cast("decimal(38,0)") * col(ss) - col(s) * col(s)).cast("double") /
        (n.cast("double") * (n.cast("double") - 1.0))
    val va = variance(col("n_a"), "__sa", "__ssa")
    val vb = variance(col("n_b"), "__sb", "__ssb")
    val ma = col("__sa").cast("double") / col("n_a").cast("double")
    val mb = col("__sb").cast("double") / col("n_b").cast("double")
    val sea = va / col("n_a").cast("double")
    val seb = vb / col("n_b").cast("double")
    val se2 = sea + seb
    val dfW = se2 * se2 /
      (sea * sea / (col("n_a").cast("double") - 1.0) +
        seb * seb / (col("n_b").cast("double") - 1.0))
    val ok = col("n_a") > 1 && col("n_b") > 1
    m.select((g ++ Seq(col("n_a"), col("n_b"),
      when(col("n_a") > 0, round(ma, 6)).as("mean_a"),
      when(col("n_b") > 0, round(mb, 6)).as("mean_b"),
      when(ok && se2 > 0.0, round((ma - mb) / sqrt(se2), 6)).as("t_stat"),
      when(ok && se2 > 0.0, round(dfW, 6)).as("df"))): _*)
  }

  /** Wilson score interval per group for a binary outcome — the
    * proportion estimate whose coverage survives small n and extreme
    * p̂ (unlike the Wald ±z√(p(1−p)/n) interval taught first and wrong
    * first): center (p̂ + z²/2n)/(1 + z²/n), half-width
    * (z/(1+z²/n))·√(p̂(1−p̂)/n + z²/4n²).
    *
    * ONE hash aggregate (k, n per group); the interval is a fixed-order
    * double expression over two longs and the z constant — z² is
    * pre-multiplied in Scala so both engines see the same literal.
    *
    * @param positive boolean expression marking a success
    * @return (groupCols..., n, k, p_hat, lo, hi) rounded to 6. */
  def wilsonInterval(df: DataFrame, groupCols: Seq[String],
      positive: Column, zCrit: Double = 1.96): DataFrame = {
    require(zCrit > 0, s"zCrit must be > 0, got $zCrit")
    val g = groupCols.map(col)
    val z2 = zCrit * zCrit
    val m = df.groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(when(positive, 1L).otherwise(0L)).as("k"))
    val n = col("n").cast("double")
    val p = col("k").cast("double") / n
    val denom = lit(1.0) + lit(z2) / n
    val center = (p + lit(z2) / (n * 2.0)) / denom
    val half = (lit(zCrit) / denom) *
      sqrt(p * (lit(1.0) - p) / n + lit(z2) / (n * n * 4.0))
    m.select((g ++ Seq(col("n"), col("k"),
      round(p, 6).as("p_hat"),
      round(center - half, 6).as("lo"),
      round(center + half, 6).as("hi"))): _*)
  }

  /** Cohen's kappa — chance-corrected agreement between two categorical
    * columns over the same rows (two annotators, or a classifier vs its
    * gold labels, the q12-vs-corpus eval). With D = Σ diagonal counts
    * and S = Σ_k row_k·col_k (marginal products over the SAME category),
    * κ = (n·D − S) / (n² − S) — exact BIGINT up to the one closing
    * division (n ≤ ~3·10⁹ before n² needs widening). NULL when n² = S
    * (a degenerate single-category table, κ undefined).
    *
    * Scale shape: one contingency aggregate over the data, then
    * everything runs on the tiny (k_a × k_b) table — the marginal join
    * is category-keyed and broadcast-sized by construction.
    *
    * @param pairs two-column DataFrame (a, b) of paired labels.
    * @return one row: (n, agree, kappa). */
  def cohensKappa(pairs: DataFrame): DataFrame = {
    val ct = pairs.toDF("a", "b")
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c"))
      .persist() // three readers below; freed with the plan
    val tot = ct.agg(sum(col("c")).as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L))
        .as("agree"))
    val s = ct.groupBy(col("a")).agg(sum(col("c")).as("r"))
      .join(ct.groupBy(col("b")).agg(sum(col("c")).as("cc")),
        col("a") === col("b"))
      .agg(coalesce(sum(col("r") * col("cc")), lit(0L)).as("s"))
    tot.crossJoin(s)
      .select(col("n"), col("agree"),
        when(col("n") * col("n") - col("s") =!= 0L,
          (col("n") * col("agree") - col("s")).cast("double")
            / (col("n") * col("n") - col("s")).cast("double"))
          .as("kappa"))
  }

  /** Per-group power-law fit y ≈ a·x^b by OLS in log-log space — the
    * Zipf-exponent / scaling-law estimator (token frequency vs rank,
    * loss vs compute). `x` and `y` must be POSITIVE (ranks, counts).
    *
    * Numerics (the PMI/MI transcendental discipline): each ln() is one
    * libm call whose ±1-ulp engine skew is absorbed by round(9); the
    * rounded terms become DECIMAL(18,9), whose pairwise products are
    * exact DECIMAL(36,18) — both under DuckDB's 38-digit multiply cap —
    * so all five moments are fold-order-free decimal sums. The closing
    * slope/intercept/R² arithmetic casts each moment to double ONCE and
    * evaluates a fixed-order IEEE expression, identical in any engine.
    * Degenerate groups (n < 2 or zero x-variance) report NULLs.
    *
    * Scale shape: a narrow projection + ONE hash aggregate; rank
    * windows (if the caller fits frequency-vs-rank) happen upstream.
    *
    * Rows with non-positive (or NULL) x or y are EXCLUDED before the
    * aggregate — their logs are undefined, and letting them NULL out of
    * the sums while still counting into n would silently skew every
    * closing formula. `n` reports the rows actually fitted.
    *
    * @return (groupCols*, n, slope, icept_ln, r2) — `icept_ln` is
    *   ln(a); slope is the power-law exponent b. */
  def powerLawFit(df: DataFrame, groupCols: Seq[String], x: Column,
      y: Column, scale: Int = 6): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val dec = "decimal(18,9)"
    val lx = round(log(x.cast("double")), 9).cast(dec)
    val ly = round(log(y.cast("double")), 9).cast(dec)
    def d(c: String) = col(c).cast("double")
    val den = d("n") * d("sxx") - d("sx") * d("sx")
    val num = d("n") * d("sxy") - d("sx") * d("sy")
    val slope = num / den
    val denY = d("n") * d("syy") - d("sy") * d("sy")
    // degeneracy is decided on EXACT decimals (min == max ⟺ zero
    // variance), never on the double moments — with identical x's the
    // double `den` lands on rounding dust, not zero
    val xConst = col("mnx") === col("mxx")
    val yConst = col("mny") === col("mxy")
    df.filter(x > 0 && y > 0)
      .select((g :+ lx.as("__lx") :+ ly.as("__ly")): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n"),
        sum(col("__lx")).as("sx"), sum(col("__ly")).as("sy"),
        sum(col("__lx") * col("__ly")).as("sxy"),
        sum(col("__lx") * col("__lx")).as("sxx"),
        sum(col("__ly") * col("__ly")).as("syy"),
        min(col("__lx")).as("mnx"), max(col("__lx")).as("mxx"),
        min(col("__ly")).as("mny"), max(col("__ly")).as("mxy"))
      .select((g :+ col("n") :+
        when(col("n") >= 2 && !xConst,
          round(slope, scale)).as("slope") :+
        when(col("n") >= 2 && !xConst,
          round((d("sy") - slope * d("sx")) / d("n"), scale))
          .as("icept_ln") :+
        when(col("n") >= 2 && !xConst && !yConst,
          round(num * num / (den * denY), scale)).as("r2")): _*)
  }
}
