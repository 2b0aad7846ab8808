package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: snap irregular observations onto a
  * per-key calendar spine and forward-fill the gaps (LOCF — last
  * observation carried forward). The missing half of every feature
  * store / metrics backfill: joins against an irregular event table
  * need a value for EVERY period, not just the ones that happened to
  * see an event.
  *
  * Scale shape: one aggregation collapses observations to (key,
  * period) grain; the spine derives from a key-grain aggregate of
  * that and explodes narrowly (`sequence` per key, no shuffle). When
  * the collapsed table is broadcast-able (the common case — its size
  * is keys × OBSERVED periods), the fill join is a broadcast join and
  * the LOCF window reuses the spine's hash(key) partitioning: two
  * exchanges total, none over raw observations' full width. In the
  * sort-merge regime it is one exchange more; nothing ever sorts
  * globally, and the spine row count is keys × periods — explicit,
  * not data-dependent.
  */
object TimeSeries {

  /** Per-key periodic spine (from each key's first to last observed
    * period) with the latest observation per period forward-filled
    * across empty periods.
    *
    * @param unit a `date_trunc` unit ("month", "week", "day") — also
    *   the spine step.
    * @param tieCols break ties among observations sharing `tsCol`
    *   within a period; (tsCol ++ tieCols) must be unique per key for
    *   a deterministic result.
    * @return keyCols :+ "period" :+ s"${valCol}_fill" */
  def forwardFill(obs: DataFrame, keyCols: Seq[String], tsCol: String,
      valCol: String, unit: String, tieCols: Seq[String] = Nil): DataFrame = {
    val step = unit.toLowerCase match {
      case "month" => expr("interval 1 month")
      case "week" => expr("interval 7 days")
      case "day" => expr("interval 1 day")
      case u => throw new IllegalArgumentException(s"unsupported unit: $u")
    }
    val period = date_trunc(unit, col(tsCol))
    // latest value per (key, period): max over struct(ts, ties..., val)
    // orders by ts first — one aggregate, no per-period sort
    val ordered = struct(
      (col(tsCol) +: tieCols.map(col)) :+ col(valCol).as("__v"): _*)
    val perPeriod = obs
      .groupBy((keyCols.map(col) :+ period.as("period")): _*)
      .agg(max(ordered).getField("__v").as("__val"))
    val spine = perPeriod
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("period")).as("__mn"), max(col("period")).as("__mx"))
      .select((keyCols.map(col) :+
        explode(sequence(col("__mn"), col("__mx"), step)).as("period")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("period"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(perPeriod, keyCols :+ "period", "left")
      .select((keyCols.map(col) :+ col("period") :+
        last(col("__val"), ignoreNulls = true).over(w)
          .as(s"${valCol}_fill")): _*)
  }

  /** Linear interpolation across interior calendar gaps — the
    * between-observations complement of [[forwardFill]]'s LOCF: an
    * empty period between two observed ones gets
    * `prev + (next − prev) · (i − i₀)/(i₁ − i₀)` over the SPINE INDEX
    * (dense by construction, so index distance == period count — no
    * irregular-month-length arithmetic); periods before the first or
    * after the last observation stay NULL (extrapolation is the
    * caller's policy, LOCF if they want it).
    *
    * Scale shape: identical to [[forwardFill]] — one collapse
    * aggregate, a narrow spine explode, one hash(key) window pass
    * (four IGNORE-NULLS frames over the same sort). Numerics: the
    * interpolation is ONE fixed-order double expression over the same
    * picked observation values in both engines, emitted UNROUNDED —
    * dyadic index fractions land results exactly on half-µ boundaries
    * where round(6) makes engines DISAGREE (the q148 rule: rounding
    * only absorbs noise, and an identical-double expression has none;
    * measured 4/96k rows flipping ±1e-6 with rounding, zero without).
    *
    * @return keyCols :+ "period" :+ s"${valCol}_interp" */
  def interpolate(obs: DataFrame, keyCols: Seq[String], tsCol: String,
      valCol: String, unit: String, tieCols: Seq[String] = Nil): DataFrame = {
    val step = unit.toLowerCase match {
      case "month" => expr("interval 1 month")
      case "week" => expr("interval 7 days")
      case "day" => expr("interval 1 day")
      case u => throw new IllegalArgumentException(s"unsupported unit: $u")
    }
    val period = date_trunc(unit, col(tsCol))
    val ordered = struct(
      (col(tsCol) +: tieCols.map(col)) :+ col(valCol).as("__v"): _*)
    val perPeriod = obs
      .groupBy((keyCols.map(col) :+ period.as("period")): _*)
      .agg(max(ordered).getField("__v").as("__val"))
    val spine = perPeriod
      .groupBy(keyCols.map(col): _*)
      .agg(min(col("period")).as("__mn"), max(col("period")).as("__mx"))
      .select((keyCols.map(col) :+
        explode(sequence(col("__mn"), col("__mx"), step)).as("period")): _*)
    val base = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("period"))
    val back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsIdx = when(col("__val").isNotNull, col("__i"))
    val pv = last(col("__val"), ignoreNulls = true).over(back)
    val pi = last(obsIdx, ignoreNulls = true).over(back)
    val nv = first(col("__val"), ignoreNulls = true).over(fwd)
    val ni = first(obsIdx, ignoreNulls = true).over(fwd)
    val frac = (col("__i") - col("__pi")).cast("double") /
      (col("__ni") - col("__pi")).cast("double")
    spine.join(perPeriod, keyCols :+ "period", "left")
      .withColumn("__i", row_number().over(base))
      .select((keyCols.map(col) :+ col("period") :+ col("__val") :+
        col("__i") :+ pv.as("__pv") :+ pi.as("__pi") :+
        nv.as("__nv") :+ ni.as("__ni")): _*)
      .select((keyCols.map(col) :+ col("period") :+
        when(col("__val").isNotNull, col("__val").cast("double"))
          .when(col("__pi").isNotNull && col("__ni").isNotNull,
            col("__pv").cast("double") +
              (col("__nv").cast("double") - col("__pv").cast("double")) *
                frac)
          .as(s"${valCol}_interp")): _*)
  }

  /** Consecutive-period activity streaks (gaps-and-islands on an integer
    * period axis): one row per maximal run of consecutive `periodCol`
    * values within a key. The classic engagement metric ("days active in
    * a row") and the integer twin of [[forwardFill]]'s calendar spine.
    *
    * Scale shape: one distinct-collapse and one window, both on
    * hash(key) — the window's `period - row_number()` island id is
    * computed inside the same partitioning, and the closing aggregate
    * reuses it; a key's history must fit one task (same contract as any
    * per-key window).
    *
    * @param periodCol integer column (e.g. epoch days); consecutive
    *   means differ-by-1.
    * @return keyCols :+ (streak_start, streak_len) */
  def streaks(df: DataFrame, keyCols: Seq[String],
      periodCol: String): DataFrame = {
    df.select((keyCols.map(col) :+ col(periodCol).as("__p")): _*)
      .distinct()
      .withColumn("__island", col("__p") - row_number().over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(col("__p"))))
      .groupBy((keyCols.map(col) :+ col("__island")): _*)
      .agg(min(col("__p")).as("streak_start"),
        count(lit(1)).as("streak_len"))
      .drop("__island")
  }

  /** Piecewise-constant (LOCF) time-weighted average of `valCol` per key
    * over the key's observed span: Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first).
    * The standard TWAP/uptime-style summary where sample spacing is
    * irregular and plain `avg` over-weights bursts.
    *
    * Numerics: values are scaled to integers (`round(v·scale)`), the
    * value×duration products are summed as decimal(38,0) — exact at any
    * row count — and only the final ratio divides in double, so the
    * result is independent of aggregation order (cross-engine safe).
    *
    * Scale shape: one exchange on hash(key); the `lead` window and the
    * closing aggregate share it. Keys with a single observation (zero
    * span) are dropped — a TWAP over an empty interval is undefined.
    *
    * @param scale value quantization (100 = cents).
    * @param tieCols break ties among observations sharing `tsCol` (the
    *   tied spans get zero weight either way, but the lead order — and
    *   so per-row weights — must be deterministic for oracle parity).
    * @return keyCols :+ s"${valCol}_twa" (double) */
  def timeWeightedAvg(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valCol: String, scale: Long = 100L,
      tieCols: Seq[String] = Nil): DataFrame = {
    df.select((keyCols.map(col) ++ (col(tsCol).as("__t") +:
        tieCols.map(col)) :+
        round(col(valCol) * scale).cast("long").as("__v")): _*)
      .withColumn("__dt", lead(col("__t"), 1).over(
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy((col("__t") +: tieCols.map(col)): _*))
        - col("__t"))
      .filter(col("__dt").isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum((col("__v") * col("__dt")).cast("decimal(38,0)")).as("__num"),
        sum(col("__dt").cast("decimal(38,0)")).as("__den"))
      .filter(col("__den") > 0)
      .select((keyCols.map(col) :+
        round(col("__num").cast("double") / col("__den").cast("double")
          / scale, 6).as(s"${valCol}_twa")): _*)
  }

  /** Windowed exponential smoothing (finite-lag EWMA) per key: at each
    * row, the weighted mean of the last `lags` observations with
    * weights (1−α)^j for lag j, normalized over the lags that exist
    * (pandas `ewm(adjust=True)` truncated to a fixed horizon). The
    * truncation is what makes this a pure window operator — the exact
    * recursive EWMA carries unbounded state and an engine-order float
    * recursion; at (1−α)^lags the dropped tail is bounded (≤ 2⁻⁸ of
    * the weight at the defaults) and every engine computes the SAME
    * closed-form expression.
    *
    * Numerics: for DYADIC α (0.5, 0.25, 0.75…) the weights are exact
    * powers of two, so each term of the fixed left-to-right fold is
    * exact over integer-quantized values and the result is
    * cross-engine reproducible before any rounding. Non-dyadic α still
    * works; parity then needs the caller's `round`.
    *
    * Scale shape: ONE exchange on hash(keys) — the lag chain is a
    * single window over it, `lags` is a compile-time constant (no
    * per-row loop state), and the frame never materializes beyond
    * `lags` rows.
    *
    * @param ordCol ordering column, unique per key (pre-aggregate to
    *   the (key, period) grain first — [[forwardFill]]'s contract)
    * @param valCol numeric column (quantize to integers for exactness)
    * @return input columns :+ outCol (double) */
  def expSmooth(df: DataFrame, keyCols: Seq[String], ordCol: String,
      valCol: String, alpha: Double = 0.5, lags: Int = 8,
      outCol: String = "ewma"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0, 1], got $alpha")
    require(lags >= 1 && lags <= 64, s"lags in [1, 64], got $lags")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(ordCol))
    val terms = (0 until lags).map { j =>
      val x = lag(col(valCol), j).over(w).cast("double")
      val wt = math.pow(1.0 - alpha, j)
      (when(x.isNotNull, x * wt).otherwise(lit(0.0)),
        when(x.isNotNull, lit(wt)).otherwise(lit(0.0)))
    }
    // fixed left-to-right fold — the oracle writes the same chain
    val num = terms.map(_._1).reduceLeft(_ + _)
    val den = terms.map(_._2).reduceLeft(_ + _)
    df.withColumn(outCol, num / den)
  }

  /** Holt double exponential smoothing (level + trend) per key — the
    * EXACT recursive smoother that [[expSmooth]]'s finite-lag window
    * deliberately approximates:
    *
    *   l_1 = x_1, b_1 = 0
    *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *
    * Recursion is engine-order-hostile only when the order is loose;
    * here the fold runs inside ONE sorted partition pass per key (the
    * packSequences secondary-sort pattern: repartition on keys,
    * sortWithinPartitions, O(1) state in mapPartitions, state reset on
    * key change), so every update is a FIXED-order double expression a
    * recursive-CTE oracle replays operation-for-operation — identical
    * doubles, no rounding needed until display. Dyadic α=1/2, β=1/4
    * keep the constants IEEE-exact.
    *
    * Semantics note: the recursion steps over OBSERVED rows in `ord`
    * order (pre-aggregate to the period grain first; run
    * [[forwardFill]] upstream if calendar gaps should carry state
    * differently).
    *
    * Scale shape: one exchange on hash(keys), one sorted scan — state
    * is two doubles per key regardless of series length. The streaming
    * twin is [[graft.streaming.EventPipeline.holtStream]].
    *
    * @param ordCol ordering column, unique per key
    * @param valCol numeric column (quantize to integer cents first)
    * @return (keyCols…, ordCol, x, level, trend) — x is valCol as
    *   long, level/trend raw doubles (callers round for display). */
  def holt(df: DataFrame, keyCols: Seq[String], ordCol: String,
      valCol: Column, alpha: Double = 0.5, beta: Double = 0.25): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta in [0,1], got $beta")
    require(keyCols.nonEmpty, "need at least one key column")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val in = df.select((keyCols.map(col) :+ col(ordCol) :+
        valCol.cast("long").as("x")): _*)
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols.map(col) :+ col(ordCol)): _*)
    val outSchema = StructType(in.schema.fields ++ Seq(
      StructField("level", DoubleType, nullable = false),
      StructField("trend", DoubleType, nullable = false)))
    val k = keyCols.length
    val (a, b1m) = (alpha, 1.0 - alpha)
    val (bt, btm) = (beta, 1.0 - beta)
    in.mapPartitions { it =>
      // partitions hold whole key groups, each contiguous and sorted
      var cur: Any = new AnyRef
      var l = 0.0
      var b = 0.0
      it.map { r =>
        val g = r.toSeq.take(k)
        // fail fast with the offending key — a NULL surviving the long
        // cast would otherwise NPE mid-stage with no row context
        if (r.isNullAt(k + 1)) throw new IllegalArgumentException(
          s"holt: NULL value at key=${g.mkString(",")} ord=${r.get(k)} — " +
            "filter or quantize NULLs upstream (NULL-exclusion rule)")
        val x = r.getLong(k + 1).toDouble
        if (g != cur) { cur = g; l = x; b = 0.0 }
        else {
          val lNew = a * x + b1m * (l + b)
          b = bt * (lNew - l) + btm * b
          l = lNew
        }
        Row.fromSeq(r.toSeq ++ Seq(l, b))
      }
    }(Encoders.row(outSchema))
  }

  /** Rolling z-score anomaly flags over an integer-quantized series:
    * a point is anomalous when it sits more than `k` population
    * standard deviations from the mean of its PRECEDING `window` rows
    * (the baseline excludes the current row — a self-inclusive frame
    * caps |z| at √(n−1), which can never reach a k=3 threshold).
    *
    * The FLAG is decided entirely in integer arithmetic:
    * `(x−μ)² > k²σ²  ⟺  (n·x − s)² > k²·(n·s2 − s²)` with
    * s = Σx, s2 = Σx² over the baseline frame — no float ever enters
    * the decision, so engines agree exactly even at the boundary. A
    * zero-variance baseline (≥ 2 equal rows) flags ANY deviation; a
    * baseline of < 2 rows never flags. The reported z divides once
    * (`NULL` when σ = 0 or the baseline is short). Overflow bound:
    * n·s2 < 2⁶³ — at window 7 that allows |x| up to ~4·10⁸ (cents);
    * coarsen the quantization beyond that.
    *
    * Scale shape: ONE exchange on hash(keys); both frame sums share
    * the same window sort.
    *
    * @param window number of preceding rows forming the baseline
    * @param valCol integral (cents-quantized) LONG column
    * @return input columns :+ z (double, rounded to `scale`)
    *   :+ is_anomaly (boolean, never NULL) */
  /** Forecast-baseline evaluation (the MASE denominator machinery):
    * for each key, score the two standard zero-parameter forecasters
    * on an integer-quantized periodic series —
    *
    *  - naive: x̂_t = x_{t−1}
    *  - seasonal naive: x̂_t = x_{t−season}
    *
    * over exactly the periods where BOTH references exist (calendar
    * lags via co-partitioned self-joins, not row lags — gaps in the
    * series never silently shift the reference). MASE = SAE_seasonal /
    * SAE_naive cancels the shared denominator, so it is one division
    * of exact integer sums; the MAEs divide once each for display.
    *
    * Scale shape: the base series persists once (three readers: self +
    * two lag projections — released by the ContextCleaner with the
    * plan); both lag joins hash on the same (keys, period) and the
    * final rollup reuses the key partitioning.
    *
    * @param valCol integral (cents-quantized) LONG column
    * @return (keys…, n_eval, mae_naive, mae_seasonal, mase) — mase
    *   NULL when the naive SAE is 0 (a constant-on-evaluated-days
    *   series). */
  def naiveForecastEval(df: DataFrame, keyCols: Seq[String],
      ordCol: String, valCol: String, season: Int,
      scale: Int = 6): DataFrame = {
    require(season >= 2, s"season must be >= 2, got $season")
    val ks = keyCols.map(col)
    val base = df.select((ks :+ col(ordCol).as("p") :+
      col(valCol).as("x")): _*).persist()
    def lagged(off: Int, as: String) = base.select(
      (ks :+ (col("p") + off).as("p") :+ col("x").as(as)): _*)
    val j = base
      .join(lagged(1, "f1"), keyCols :+ "p")
      .join(lagged(season, "fs"), keyCols :+ "p")
      .groupBy(ks: _*)
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("x") - col("f1"))).as("sae1"),
        sum(abs(col("x") - col("fs"))).as("saes"))
    j.select((ks :+ col("n_eval") :+
      round(col("sae1").cast("double") / col("n_eval").cast("double"),
        scale).as("mae_naive") :+
      round(col("saes").cast("double") / col("n_eval").cast("double"),
        scale).as("mae_seasonal") :+
      when(col("sae1") > 0,
        round(col("saes").cast("double") / col("sae1").cast("double"),
          scale)).as("mase")): _*)
  }

  /** Sliding-window distinct actives (rolling WAU): for each window-end
    * period `win`, the number of DISTINCT keys active in
    * `[win − window + 1, win]`, plus the total active key-periods in
    * that window. Sliding distinct has no algebraic frame aggregate —
    * a window function would need a per-frame set — so each distinct
    * (key, period) observation instead REPLICATES to the `window`
    * window-ends it contributes to, and distinct-count becomes a plain
    * grouped aggregate.
    *
    * Scale shape: one shuffle collapses raw events to (key, period);
    * the ×window explode is narrow and its factor is the window length
    * (bounded, e.g. 7), NOT the event count; the final per-window
    * count(distinct) is one partial-distinct hash aggregate. Nothing
    * ever holds a window's membership set.
    *
    * @return (win, actives, key_periods) — every window-end reachable
    *   from an observation (first period .. last period + window − 1);
    *   windows overhanging the observed range count their partial
    *   contents. */
  def slidingDistinct(df: DataFrame, keyCol: String, periodCol: String,
      window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    df.select(col(keyCol).as("k"), col(periodCol).cast("long").as("p"))
      .distinct()
      .select(col("k"),
        explode(sequence(col("p"), col("p") + (window - 1))).as("win"))
      .groupBy("win")
      .agg(countDistinct(col("k")).as("actives"),
        count(lit(1)).as("key_periods"))
  }

  /** Two-sided CUSUM change-point detection per key over an
    * integer-valued ordered series, against the key's own mean.
    *
    * The textbook recursion S⁺_t = max(0, S⁺_{t−1} + (x_t − μ − slack))
    * looks inherently sequential, but the zero-clamped recursion has a
    * closed form: S⁺_t = P_t − min(0, min_{j≤t} P_j) where P is the
    * prefix sum of the deviations — so the whole detector is two
    * running-window aggregates per side, fully distributed, O(1) state,
    * no loop in either engine (Page 1954's V-mask dual, prefix form).
    *
    * Exactness: μ = S/n is not integral, so every term is scaled by n
    * (the key's row count): d⁺_t = n·x_t − S − n·slack is a pure
    * integer, as are its prefix sums; the alarm compare S⁺ > n·h is
    * cross-multiplied. The reported statistics divide back by n·scale
    * once, rounded — the oracle repeats the same text.
    *
    * @param valCol integer-valued column (e.g. cents)
    * @param slack  slack ("allowance") in valCol units
    * @param h      alarm threshold in valCol units
    * @param scale  valCol units per output unit (100 for cents)
    * @return input keys + ord + (cusum_hi, cusum_lo, alarm_hi,
    *   alarm_lo) per row */
  def cusum(df: DataFrame, keyCols: Seq[String], ordCol: String,
      valCol: String, slack: Long, h: Long, scale: Int = 100): DataFrame = {
    require(h > 0, s"threshold h must be > 0, got $h")
    require(slack >= 0, s"slack must be >= 0, got $slack")
    val g = keyCols.map(col)
    val wAll = Window.partitionBy(g: _*)
    val wCum = Window.partitionBy(g: _*).orderBy(col(ordCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = col(valCol).cast("long")
    val base = df
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__s", sum(x).over(wAll))
    // scaled deviations: n·x − S ∓ n·slack (exact longs; n ≤ series
    // length and x in cents keeps n·x far from Long overflow)
    val dHi = col("__n") * x - col("__s") - col("__n") * slack
    val dLo = col("__s") - col("__n") * x - col("__n") * slack
    val withP = base
      .withColumn("__p_hi", sum(dHi).over(wCum))
      .withColumn("__p_lo", sum(dLo).over(wCum))
    // S_t = P_t − min(0, running min P) — reuses wCum's sort
    val sHi = col("__p_hi") - least(lit(0L), min(col("__p_hi")).over(wCum))
    val sLo = col("__p_lo") - least(lit(0L), min(col("__p_lo")).over(wCum))
    withP
      .withColumn("cusum_hi",
        round(sHi.cast("double") / col("__n") / scale, 6))
      .withColumn("cusum_lo",
        round(sLo.cast("double") / col("__n") / scale, 6))
      .withColumn("alarm_hi", sHi > col("__n") * h)
      .withColumn("alarm_lo", sLo > col("__n") * h)
      .drop("__n", "__s", "__p_hi", "__p_lo")
  }

  /** Autocorrelation function per key at calendar lags 1..maxLag: the
    * Pearson correlation of (x_t, x_{t−ℓ}) over every t where BOTH
    * periods exist — lags are calendar offsets like
    * [[naiveForecastEval]], so gaps drop pairs instead of shifting the
    * reference (row-lag windows silently misalign on gappy series).
    *
    * Shape: ONE equi-join regardless of lag count — the lagged side is
    * replicated ×maxLag by an explode (bounded, like slidingDistinct's
    * window trick) and shifted before the join, so lag is just another
    * join-output column feeding the grouped moment aggregate.
    *
    * Numerics follow [[graft.operators.Stats.corrMatrix]]: integer
    * values widen to decimal(38,0) BEFORE the products, r's numerator/
    * denominator stay exact, one fixed-order double division at the
    * end; zero variance on either side (constant series) → NULL.
    *
    * @param valCol integer-valued column (e.g. cents)
    * @return (keyCols..., lag, n_pairs, acf) — lags with no pairs are
    *   absent */
  def acf(df: DataFrame, keyCols: Seq[String], ordCol: String,
      valCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val g = keyCols.map(col)
    val x = df.select((g ++ Seq(col(ordCol).cast("long").as("__t"),
      col(valCol).cast("long").cast("decimal(38,0)").as("__v"))): _*)
    val lagged = x
      .select((g ++ Seq(col("__t"), col("__v").as("__vl"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))): _*)
      .select((g ++ Seq(col("lag"), (col("__t") + col("lag")).as("__t"),
        col("__vl"))): _*)
    val num = (col("n_pairs") * col("__sp") -
      col("__sa") * col("__sb")).cast("double")
    val den = sqrt((col("n_pairs") * col("__ssa") -
      col("__sa") * col("__sa")).cast("double")) *
      sqrt((col("n_pairs") * col("__ssb") -
        col("__sb") * col("__sb")).cast("double"))
    x.join(lagged, keyCols :+ "__t")
      .groupBy((g :+ col("lag")): _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__v")).as("__sa"), sum(col("__vl")).as("__sb"),
        sum(col("__v") * col("__v")).as("__ssa"),
        sum(col("__vl") * col("__vl")).as("__ssb"),
        sum(col("__v") * col("__vl")).as("__sp"))
      .withColumn("acf", when(den =!= lit(0.0), round(num / den, 6)))
      .drop("__sa", "__sb", "__ssa", "__ssb", "__sp")
  }

  /** Classical additive seasonal decomposition (the STL-lite every
    * metrics pipeline runs before anomaly rules): per key,
    * x_t = trend + seasonal + remainder with
    *
    *  - trend_t: centered `period`-point moving average (odd period —
    *    the day-of-week=7 case; rows without a full window are
    *    dropped, the classical edge convention);
    *  - seasonal_j (j = ord mod period): mean detrended value of the
    *    phase, centered by the GLOBAL detrended mean (count-weighted
    *    centering — one exact integer ratio, where the textbook
    *    mean-of-phase-means would force an order-dependent double
    *    fold);
    *  - remainder: what's left.
    *
    * Numerics: `valInt` is integer-valued (cents discipline), so the
    * window sum, the per-row detrended numerator (x·p − Σwindow), and
    * the phase/global aggregates are EXACT integers in any engine and
    * fold order; trend/seasonal/remainder each close in one
    * fixed-order double expression, rounded.
    *
    * Scale shape: one ordered window pass per key (the forwardFill
    * partitioning), one phase aggregate (period-sized), one global
    * aggregate, broadcast back — the series rows shuffle once.
    *
    * @return (keyCols..., ordCol, val_int, trend, seasonal, remainder)
    *   for rows with a full trend window. */
  def decompose(df: DataFrame, keyCols: Seq[String], ordCol: String,
      valInt: Column, period: Int, scale: Int = 6): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd and >= 3, got $period")
    val h = (period - 1) / 2
    val g = keyCols.map(col)
    val base = df.select(
      (g ++ Seq(col(ordCol).cast("long").as("__t"),
        valInt.cast("long").as("__v"))): _*)
    val w = Window.partitionBy(g: _*).orderBy(col("__t"))
      .rowsBetween(-h, h)
    val trended = base
      .withColumn("__s", sum(col("__v")).over(w))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") === period)
      .withColumn("__num", col("__v") * period - col("__s"))
      .withColumn("__phase", pmod(col("__t"), lit(period.toLong)))
    val phases = trended.groupBy((g :+ col("__phase")): _*)
      .agg(sum(col("__num")).as("__pnum"), count(lit(1)).as("__pn"))
    val globals = trended.groupBy(g: _*)
      .agg(sum(col("__num")).as("__gnum"), count(lit(1)).as("__gn"))
    val seasonal =
      col("__pnum").cast("double") / (col("__pn") * period).cast("double") -
        col("__gnum").cast("double") / (col("__gn") * period).cast("double")
    trended
      .join(phases, keyCols :+ "__phase")
      .join(globals, keyCols)
      .select((g ++ Seq(col("__t").as(ordCol), col("__v").as("val_int"),
        round(col("__s").cast("double") / period, scale).as("trend"),
        round(seasonal, scale).as("seasonal"),
        round(col("__num").cast("double") / period - seasonal, scale)
          .as("remainder"))): _*)
  }

  def rollingAnomaly(df: DataFrame, keyCols: Seq[String], ordCol: String,
      valCol: String, window: Int, k: Int = 3,
      scale: Int = 6): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(ordCol))
      .rowsBetween(-window, -1)
    val x = col(valCol)
    val s = sum(x).over(w)
    val s2 = sum(x * x).over(w)
    val n = count(lit(1)).over(w)
    val dev = n * x - s          // n·(x − μ), integral
    val varN2 = n * s2 - s * s   // n²·σ², integral
    // z = (x−μ)/σ = dev / √varN2 — the n's cancel; one division, one
    // sqrt, both from exact integers (identical text in the oracle)
    df.withColumn("z",
        when(varN2 > 0,
          round(dev.cast("double") / sqrt(varN2.cast("double")), scale)))
      .withColumn("is_anomaly", coalesce(
        (varN2 > 0 && dev * dev > lit(k.toLong * k) * varN2) ||
          (varN2 === 0 && n >= 2 && dev =!= 0),
        lit(false)))
  }

  /** Cross-correlation between every ordered pair of keyed series at
    * calendar lags 0..maxLag — [[acf]]'s two-series sibling and the
    * lead–lag screen ("does A's spend predict B's a week later?"):
    * xcf(a→b, ℓ) = corr over t of (a_t, b_{t+ℓ}), pairs restricted to
    * periods where BOTH series exist (gaps drop pairs, never shift).
    *
    * Shape: ONE equi-join on the period — the lagged side replicates
    * ×(maxLag+1) by a bounded explode, and the a≠b pair fan-out rides
    * the same join (output factor = series × lags; meant for a BOUNDED
    * series dimension — segments, arms, regions — not per-user keys:
    * pre-aggregate or pre-filter the pair set first at that scale).
    * Numerics are [[acf]]'s: decimal-exact moments, one fixed-order
    * double division, NULL on zero variance.
    *
    * @param valCol integer-valued column (e.g. cents)
    * @return (series_a, series_b, lag, n_pairs, xcf) for a ≠ b; lag 0
    *   included (contemporaneous correlation). */
  def crossCorr(df: DataFrame, seriesCol: String, ordCol: String,
      valCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    val x = df.select(col(seriesCol).as("series_a"),
      col(ordCol).cast("long").as("__t"),
      col(valCol).cast("long").cast("decimal(38,0)").as("__v"))
    val lagged = df
      .select(col(seriesCol).as("series_b"),
        col(ordCol).cast("long").as("__t"),
        col(valCol).cast("long").cast("decimal(38,0)").as("__vb"),
        explode(sequence(lit(0), lit(maxLag))).as("lag"))
      // b's row at period t surfaces at join key t − ℓ, so a's row at
      // period t pairs with b's value from t + ℓ (b trails the key)
      .select(col("series_b"), col("lag"),
        (col("__t") - col("lag")).as("__t"), col("__vb"))
    val num = (col("n_pairs") * col("__sp") -
      col("__sa") * col("__sb")).cast("double")
    val den = sqrt((col("n_pairs") * col("__ssa") -
      col("__sa") * col("__sa")).cast("double")) *
      sqrt((col("n_pairs") * col("__ssb") -
        col("__sb") * col("__sb")).cast("double"))
    x.join(lagged, Seq("__t"))
      .filter(col("series_a") =!= col("series_b"))
      .groupBy(col("series_a"), col("series_b"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__v")).as("__sa"), sum(col("__vb")).as("__sb"),
        sum(col("__v") * col("__v")).as("__ssa"),
        sum(col("__vb") * col("__vb")).as("__ssb"),
        sum(col("__v") * col("__vb")).as("__sp"))
      .withColumn("xcf", when(den =!= lit(0.0), round(num / den, 6)))
      .drop("__sa", "__sb", "__ssa", "__ssb", "__sp")
  }

  /** Kaplan–Meier survival curve per group over right-censored integer
    * durations — churn/retention analysis done correctly: censored
    * subjects (still alive at observation end) leave the risk set
    * without counting as deaths, instead of being dropped or counted
    * as churned. S(t) = Π_{t'≤t, d>0} (1 − d_{t'}/n_{t'}).
    *
    * Order-safe product: each step's ln(1 − d/n) — ONE division of
    * exact integers ((n−d)/n), one ln — is rounded to 9 decimals and
    * cumulated as decimal(38,9) (the q139 order-free-transcendental
    * discipline), closed by one exp + round(6). When a step kills the
    * whole risk set (d = n), survival is exactly 0 from there on
    * (flagged by a cumulative max, not a −∞ log).
    *
    * Scale: rows collapse FIRST to one row per (group, duration) with
    * death/censor counts; the risk-set window, the log-sum window, and
    * the flag window all share that table's group partitioning. The
    * duration axis is the knob — quantize durations (days, not ms) so
    * the per-group curve stays thousands of points.
    *
    * @param durInt integer duration expression (NULLs dropped)
    * @param died   boolean: true = event observed, false = censored
    * @return (groupCols..., t, n_risk, n_events, n_censored,
    *   survival) — one row per distinct duration with any activity. */
  def kaplanMeier(df: DataFrame, groupCols: Seq[String], durInt: Column,
      died: Column): DataFrame = {
    val g = groupCols.map(col)
    val perT = df
      .select((g ++ Seq(durInt.cast("long").as("t"),
        when(died, 1L).otherwise(0L).as("__d"))): _*)
      .filter(col("t").isNotNull)
      .groupBy((g :+ col("t")): _*)
      .agg(sum(col("__d")).as("n_events"),
        (count(lit(1)) - sum(col("__d"))).as("n_censored"))
    val wAll = Window.partitionBy(g: _*)
    val wBefore = Window.partitionBy(g: _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(g: _*).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = perT
      .withColumn("n_risk",
        sum(col("n_events") + col("n_censored")).over(wAll) -
          coalesce(sum(col("n_events") + col("n_censored"))
            .over(wBefore), lit(0L)))
    // ln(1 − d/n) = ln((n−d)/n): exact-integer ratio, one ln, rounded
    // then decimal-summed; a d = n step zeroes the curve outright
    val term = when(col("n_events") > 0 && col("n_events") < col("n_risk"),
      round(log((col("n_risk") - col("n_events")).cast("double") /
        col("n_risk").cast("double")), 9))
      .otherwise(lit(0.0)).cast("decimal(38,9)")
    base
      .withColumn("__lnsum", sum(term).over(wCum))
      .withColumn("__dead",
        max(when(col("n_events") === col("n_risk"), 1).otherwise(0))
          .over(wCum))
      .withColumn("survival",
        when(col("__dead") === 1, lit(0.0))
          .otherwise(round(exp(col("__lnsum").cast("double")), 6)))
      .select((g ++ Seq(col("t"), col("n_risk"), col("n_events"),
        col("n_censored"), col("survival"))): _*)
  }
}
