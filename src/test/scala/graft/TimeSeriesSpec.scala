package graft

import graft.operators.TimeSeries
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("monthly spine: gaps filled with last observation, per key") {
    val obs = Seq(
      // key 1: obs in Jan and Apr → Feb/Mar carry Jan's value
      (1L, ts("2024-01-15 00:00:00"), 10.0),
      (1L, ts("2024-04-02 00:00:00"), 40.0),
      // key 2: single month, two obs — later ts wins within the month
      (2L, ts("2024-03-01 08:00:00"), 1.0),
      (2L, ts("2024-03-20 08:00:00"), 2.0)
    ).toDF("k", "t", "v")
    val got = TimeSeries.forwardFill(obs, Seq("k"), "t", "v", "month")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getDouble(2)))
      .toSet
    assert(got == Set(
      (1L, "2024-01-01 00:00:00.0", 10.0),
      (1L, "2024-02-01 00:00:00.0", 10.0),
      (1L, "2024-03-01 00:00:00.0", 10.0),
      (1L, "2024-04-01 00:00:00.0", 40.0),
      (2L, "2024-03-01 00:00:00.0", 2.0)))
  }

  test("day spine with ts ties broken by tie column") {
    val obs = Seq(
      (1L, ts("2024-01-01 12:00:00"), 7L, 100.0),
      (1L, ts("2024-01-01 12:00:00"), 9L, 200.0), // higher tie wins
      (1L, ts("2024-01-03 00:00:00"), 1L, 300.0)
    ).toDF("k", "t", "tb", "v")
    val got = TimeSeries
      .forwardFill(obs, Seq("k"), "t", "v", "day", Seq("tb"))
      .orderBy("period").collect().map(_.getDouble(2)).toSeq
    assert(got == Seq(200.0, 200.0, 300.0))
  }

  test("unsupported unit rejected") {
    val obs = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      TimeSeries.forwardFill(obs, Seq("k"), "t", "v", "year")
    }
  }

  private def ewma(rows: Seq[(Long, Long, Long)], alpha: Double = 0.5,
      lags: Int = 8): Map[(Long, Long), Double] =
    TimeSeries.expSmooth(
        spark.createDataFrame(rows).toDF("k", "t", "v"),
        Seq("k"), "t", "v", alpha, lags)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap

  test("expSmooth: first row is its own value; constants stay constant") {
    val r = ewma(Seq((1L, 1L, 100L), (1L, 2L, 100L), (1L, 3L, 100L),
      (2L, 1L, 7L)))
    assert(r((1L, 1L)) == 100.0 && r((1L, 2L)) == 100.0 &&
      r((1L, 3L)) == 100.0)
    assert(r((2L, 1L)) == 7.0) // keys smooth independently
  }

  test("expSmooth: hand-computed dyadic weights") {
    val r = ewma(Seq((1L, 1L, 100L), (1L, 2L, 200L), (1L, 3L, 300L)))
    assert(r((1L, 2L)) == (200.0 + 50.0) / 1.5)
    assert(r((1L, 3L)) == (300.0 + 100.0 + 25.0) / 1.75)
  }

  test("expSmooth: the lag horizon truncates exactly") {
    // lags=2: row 3 must ignore the t=1 observation entirely
    val r = ewma(Seq((1L, 1L, 1000000L), (1L, 2L, 200L), (1L, 3L, 300L)),
      lags = 2)
    assert(r((1L, 3L)) == (300.0 + 100.0) / 1.5)
  }

  test("expSmooth == brute-force closed form on random series") {
    val rnd = new scala.util.Random(3)
    val rows = for (k <- 1L to 5L; t <- 1L to 30L)
      yield (k, t, rnd.nextInt(100000).toLong)
    val r = ewma(rows, alpha = 0.5, lags = 8)
    rows.groupBy(_._1).foreach { case (k, series) =>
      val vs = series.sortBy(_._2).map(_._3)
      vs.indices.foreach { i =>
        val window = (0 until math.min(8, i + 1)).map(j =>
          (vs(i - j).toDouble * math.pow(0.5, j), math.pow(0.5, j)))
        val want = window.map(_._1).sum / window.map(_._2).sum
        assert(math.abs(r((k, i + 1L)) - want) < 1e-9)
      }
    }
  }

  test("expSmooth rejects bad parameters") {
    val df = spark.createDataFrame(Seq((1L, 1L, 1L))).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      TimeSeries.expSmooth(df, Seq("k"), "t", "v", alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.expSmooth(df, Seq("k"), "t", "v", lags = 0)
    }
  }

  test("rollingAnomaly: spike against a noisy baseline flags; noise does not") {
    // baseline days 1..7 around 100 with some spread, day 8 = 1000
    val vals = Seq(98L, 102L, 100L, 97L, 103L, 101L, 99L, 1000L)
    val df = vals.zipWithIndex
      .map { case (v, i) => ("u", (i + 1).toLong, v) }
      .toDF("k", "t", "v")
    val got = TimeSeries.rollingAnomaly(df, Seq("k"), "t", "v",
        window = 7, k = 3)
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))
      .toMap
    assert(got(8L)._2, "the spike must flag")
    assert(got(8L)._1.get > 100.0) // hundreds of sigma out
    (2L to 7L).foreach { d =>
      assert(!got(d)._2, s"baseline day $d must not flag")
    }
    // day 1 has no baseline: z NULL, no flag
    assert(got(1L)._1.isEmpty && !got(1L)._2)
  }

  test("rollingAnomaly: zero-variance baseline flags any deviation, z NULL") {
    val df = Seq(("u", 1L, 100L), ("u", 2L, 100L), ("u", 3L, 100L),
      ("u", 4L, 101L)).toDF("k", "t", "v")
    val got = TimeSeries.rollingAnomaly(df, Seq("k"), "t", "v", 7, 3)
      .collect().map(r => r.getLong(1) ->
        (r.isNullAt(3), r.getBoolean(4))).toMap
    assert(got(4L) == ((true, true)))  // σ=0, x≠μ → flagged, z NULL
    assert(got(3L) == ((true, false))) // σ=0, x=μ → quiet
    assert(got(2L) == ((true, false))) // 1-row baseline → never flags
  }

  test("rollingAnomaly: boundary is strict (dev² == k²·σ²·n² does not flag)") {
    // baseline {0, 2}: n=2, s=2, s2=4 → varN2 = 4; dev = 2x−2.
    // k=1: flag iff (2x−2)² > 4 — x=2 sits exactly ON the boundary
    val df = Seq(("u", 1L, 0L), ("u", 2L, 2L), ("u", 3L, 2L))
      .toDF("k", "t", "v")
    val got = TimeSeries.rollingAnomaly(df, Seq("k"), "t", "v",
        window = 2, k = 1)
      .collect().map(r => r.getLong(1) -> r.getBoolean(4)).toMap
    assert(!got(3L))
  }

  test("naiveForecastEval: hand case — gaps drop eval days, exact ratios") {
    // days 1..9 except day 5 missing; season 3.
    // eval days need t-1 AND t-3 present: t=4 (3,1 ok), t=7 (6,4 ok),
    // t=9 (8,6 ok); t=8 lacks t-1=7? 7 present, t-3=5 missing -> out
    val rows = Seq(1L -> 10L, 2L -> 12L, 3L -> 11L, 4L -> 20L,
      6L -> 14L, 7L -> 13L, 8L -> 30L, 9L -> 16L)
    val df = rows.map { case (d, v) => ("u", d, v) }.toDF("k", "p", "v")
    val got = TimeSeries.naiveForecastEval(df, Seq("k"), "p", "v", 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).head
    // t=4: |20-11|=9 naive, |20-10|=10 seasonal
    // t=7: |13-14|=1,       |13-20|=7
    // t=9: |16-30|=14,      |16-14|=2
    // SAE1=24, SAEs=19, n=3
    assert(got == ((3L, 8.0, BigDecimal(19.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, 0.791667)))
  }

  test("naiveForecastEval: constant series gives mase NULL, zero MAEs") {
    val df = (1L to 10L).map(d => ("u", d, 5L)).toDF("k", "p", "v")
    val r = TimeSeries.naiveForecastEval(df, Seq("k"), "p", "v", 7)
      .collect().head
    assert(r.getLong(1) == 3L) // days 8,9,10
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
    assert(r.isNullAt(4))
  }

  test("naiveForecastEval: partitioning-invariant on random series") {
    val rnd = new scala.util.Random(91)
    val rows = for {
      u <- 1 to 6; d <- 1 to 40 if rnd.nextInt(10) > 1
    } yield (s"u$u", d.toLong, rnd.nextInt(500).toLong)
    val df = rows.toDF("k", "p", "v")
    val a = TimeSeries.naiveForecastEval(df.repartition(13), Seq("k"),
      "p", "v", 7).collect().map(_.toSeq).toSet
    val b = TimeSeries.naiveForecastEval(df.coalesce(1), Seq("k"),
      "p", "v", 7).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("slidingDistinct: hand case — overlap windows, repeats collapse") {
    // u1 on days 1 and 3 (twice), u2 on day 3; window = 3
    val df = Seq(("u1", 1L), ("u1", 3L), ("u1", 3L), ("u2", 3L))
      .toDF("k", "p")
    val got = TimeSeries.slidingDistinct(df, "k", "p", window = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(
      1L -> ((1L, 1L)), 2L -> ((1L, 1L)),
      3L -> ((2L, 3L)), // u1 contributes from BOTH day 1 and day 3
      4L -> ((2L, 2L)), 5L -> ((2L, 2L))))
  }

  test("slidingDistinct == brute-force window membership") {
    val rnd = new scala.util.Random(59)
    val obs = (1 to 400).map(_ =>
      (s"u${rnd.nextInt(12)}", rnd.nextInt(40).toLong))
    val df = obs.toDF("k", "p").repartition(7)
    val w = 7
    val got = TimeSeries.slidingDistinct(df, "k", "p", w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val pairs = obs.distinct
    val brute = pairs.flatMap { case (k, p) => (p until p + w).map(_ -> k) }
    val exp = brute.groupBy(_._1).map { case (win, ks) =>
      win -> ((ks.map(_._2).distinct.size.toLong, ks.size.toLong)) }
    assert(got == exp)
  }

  test("rollingAnomaly: partitioning-invariant") {
    val rnd = new scala.util.Random(23)
    val df = (1 to 200).map(i =>
      (s"u${i % 5}", i.toLong, rnd.nextInt(1000).toLong))
      .toDF("k", "t", "v")
    val a = TimeSeries.rollingAnomaly(df.repartition(11), Seq("k"), "t",
      "v", 7).collect().map(_.toSeq).toSet
    val b = TimeSeries.rollingAnomaly(df.coalesce(1), Seq("k"), "t",
      "v", 7).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("acf: linear series is 1 at every lag; alternating flips sign; " +
      "constants are NULL") {
    val rows =
      (1 to 20).map(t => ("lin", t.toLong, t.toLong * 3 + 5)) ++
      (1 to 20).map(t => ("alt", t.toLong, if (t % 2 == 0) 10L else -10L)) ++
      (1 to 20).map(t => ("const", t.toLong, 7L))
    val df = rows.toDF("k", "t", "v").repartition(5)
    val got = TimeSeries.acf(df, Seq("k"), "t", "v", maxLag = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), Option(r.get(3))))).toMap
    assert(got(("lin", 1)) == ((19L, Some(1.0))))
    assert(got(("lin", 2)) == ((18L, Some(1.0))))
    assert(got(("alt", 1)) == ((19L, Some(-1.0))))
    assert(got(("alt", 2)) == ((18L, Some(1.0))))
    assert(got(("const", 1))._2.isEmpty) // zero variance: NULL
  }

  test("acf: calendar gaps drop pairs instead of shifting the series") {
    // days 1,2,3,5,6 — lag-1 pairs: (2,1),(3,2),(6,5) -> 3; the (5,3)
    // row-adjacency must NOT pair. lag-2 pairs: (3,1),(5,3) -> 2
    val df = Seq(1L, 2L, 3L, 5L, 6L).map(d => ("u", d, d * 10))
      .toDF("k", "t", "v")
    val got = TimeSeries.acf(df, Seq("k"), "t", "v", maxLag = 2)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(got == Map(1 -> 3L, 2 -> 2L))
  }

  test("acf == brute-force Pearson over lag pairs on random gappy series") {
    val rnd = new scala.util.Random(59)
    val series = (0 until 5).map { k =>
      s"u$k" -> (1 to 60).filter(_ => rnd.nextDouble() < 0.8)
        .map(d => d.toLong -> (rnd.nextInt(2000).toLong - 500L)).toMap
    }.toMap
    val df = series.toSeq.flatMap { case (k, m) =>
      m.toSeq.map { case (d, v) => (k, d, v) } }.toDF("k", "t", "v")
      .repartition(9)
    val got = TimeSeries.acf(df, Seq("k"), "t", "v", maxLag = 3)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    series.foreach { case (k, m) =>
      (1 to 3).foreach { lag =>
        val pairs = m.toSeq.collect {
          case (d, v) if m.contains(d - lag) => (v.toDouble, m(d - lag).toDouble)
        }
        if (pairs.isEmpty) assert(!got.contains((k, lag)))
        else {
          val n = pairs.size
          val (sa, sb) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
          val sp = pairs.map(p => p._1 * p._2).sum
          val ssa = pairs.map(p => p._1 * p._1).sum
          val ssb = pairs.map(p => p._2 * p._2).sum
          val den = math.sqrt(n * ssa - sa * sa) * math.sqrt(n * ssb - sb * sb)
          val (gn, gr) = got((k, lag))
          assert(gn == n.toLong, s"$k lag $lag n")
          if (den == 0) assert(gr.isEmpty)
          else assert(math.abs(gr.get - (n * sp - sa * sb) / den) < 2e-6,
            s"$k lag $lag r")
        }
      }
    }
  }

  test("decompose: planted week cycle recovered; identity v = t+s+r") {
    // v_t = 1000 + 10*t (trend) + planted seasonal by day-of-week
    val season = Array(300L, -200L, 100L, 0L, -100L, 50L, -150L) // sums 0
    val rows = (0L until 56L).map(t =>
      ("k", t, 1000L + 10L * t + season((t % 7).toInt)))
    val df = rows.toDF("g", "day", "cents")
    val got = TimeSeries.decompose(df, Seq("g"), "day", col("cents"), 7)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // edge rows (3 each side) are dropped
    assert(got.keySet == (3L until 53L).toSet)
    got.foreach { case (day, (v, t, s, r)) =>
      // reconstruction identity survives rounding
      assert(math.abs(v.toDouble - (t + s + r)) < 1e-5, s"day $day")
      // the linear trend's centered MA is exact: 1000 + 10*day + mean
      // seasonal contribution of the full week (= 0)
      assert(math.abs(t - (1000.0 + 10.0 * day)) < 1e-6, s"trend $day")
      // planted seasonal recovered (centering shift is 0 by design)
      assert(math.abs(s - season((day % 7).toInt)) < 1.0,
        s"seasonal $day: $s vs ${season((day % 7).toInt)}")
      assert(math.abs(r) < 1.0, s"remainder $day: $r")
    }
    // partitioning invariance (exact integer internals)
    val again = TimeSeries.decompose(df.repartition(5), Seq("g"), "day",
      col("cents"), 7).collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    val first = TimeSeries.decompose(df, Seq("g"), "day", col("cents"), 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(again == first)
    assertThrows[IllegalArgumentException] {
      TimeSeries.decompose(df, Seq("g"), "day", col("cents"), 6)
    }
  }

  test("cusum: level shift alarms high side only; quiet series stays quiet") {
    // 6 days at 100, then 6 days at 400: mean 250. High side climbs
    // after the shift; low side climbs during the LOW half (x < mean),
    // so use a slack big enough (160 > 150 = |x-mu| - 0) to keep both
    // sides quiet until the shift, then h small enough to alarm.
    val vals = Seq.fill(6)(100L) ++ Seq.fill(6)(400L)
    val df = vals.zipWithIndex.map { case (v, i) => ("u", (i + 1).toLong, v) }
      .toDF("k", "t", "v")
    val got = TimeSeries.cusum(df, Seq("k"), "t", "v",
        slack = 160, h = 100, scale = 1)
      .collect().map(r => r.getLong(1) ->
        ((r.getDouble(3), r.getDouble(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap
    // deviations vs mean 250 with slack 160: hi side d = x-250-160:
    // -310 for the low half (clamped at 0), -10 for the high half —
    // wait, high half: 400-250-160 = -10 -> never accumulates. Use the
    // analytic check instead: every value below asserts the closed form.
    val mu = vals.sum.toDouble / vals.size
    var sHi = 0.0; var sLo = 0.0
    vals.zipWithIndex.foreach { case (v, i) =>
      sHi = math.max(0.0, sHi + (v - mu - 160))
      sLo = math.max(0.0, sLo + (mu - v - 160))
      val (gh, gl, ah, al) = got((i + 1).toLong)
      assert(math.abs(gh - sHi) < 1e-6, s"hi at ${i + 1}")
      assert(math.abs(gl - sLo) < 1e-6, s"lo at ${i + 1}")
      assert(ah == sHi > 100 && al == sLo > 100, s"alarms at ${i + 1}")
    }
  }

  test("cusum == sequential clamped recursion on random series") {
    val rnd = new scala.util.Random(41)
    val series = (0 until 6).map { k =>
      s"u$k" -> (1 to 50).map(_ => rnd.nextInt(20000).toLong - 5000L)
    }.toMap
    val df = series.toSeq.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case (v, i) => (k, (i + 1).toLong, v) }
    }.toDF("k", "t", "v").repartition(7)
    val got = TimeSeries.cusum(df, Seq("k"), "t", "v",
        slack = 1000, h = 3000, scale = 100)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(3), r.getDouble(4), r.getBoolean(5), r.getBoolean(6))))
      .toMap
    series.foreach { case (k, vs) =>
      val n = vs.size.toLong
      val s = vs.sum
      // integer recursion in n-scaled units — exactly the operator's math
      var rHi = 0L; var rLo = 0L
      vs.zipWithIndex.foreach { case (x, i) =>
        rHi = math.max(0L, rHi + (n * x - s - n * 1000))
        rLo = math.max(0L, rLo + (s - n * x - n * 1000))
        val (gh, gl, ah, al) = got((k, (i + 1).toLong))
        def rep(r: Long) =
          BigDecimal(r.toDouble / n / 100)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(gh == rep(rHi) && gl == rep(rLo), s"$k step ${i + 1}")
        assert(ah == rHi > n * 3000 && al == rLo > n * 3000,
          s"$k alarms step ${i + 1}")
      }
    }
  }

  test("cusum: partitioning-invariant; bad params rejected") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 300).map(i =>
      (s"u${i % 4}", i.toLong, rnd.nextInt(5000).toLong))
      .toDF("k", "t", "v")
    val a = TimeSeries.cusum(df.repartition(13), Seq("k"), "t", "v",
      slack = 500, h = 2000).collect().map(_.toSeq).toSet
    val b = TimeSeries.cusum(df.coalesce(1), Seq("k"), "t", "v",
      slack = 500, h = 2000).collect().map(_.toSeq).toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      TimeSeries.cusum(df, Seq("k"), "t", "v", slack = -1, h = 10)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.cusum(df, Seq("k"), "t", "v", slack = 0, h = 0)
    }
  }

  test("interpolate: interior gaps linear, edges NULL, observed exact") {
    val obs = Seq(
      // key 1: Jan=120, Apr=420 -> Feb=220, Mar=320 (index fractions)
      (1L, ts("2024-01-15 00:00:00"), 1L, 120.0),
      (1L, ts("2024-04-02 00:00:00"), 2L, 420.0),
      // key 2: single observation -> no interior, no edges to fill
      (2L, ts("2024-02-01 00:00:00"), 3L, 55.5))
      .toDF("k", "t", "tie", "v")
    val got = TimeSeries.interpolate(obs, Seq("k"), "t", "v", "month",
        Seq("tie"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(7)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got((1L, "2024-01")) == Some(120.0))
    assert(got((1L, "2024-02")) == Some(120.0 + 300.0 * (1.0 / 3.0)))
    assert(got((1L, "2024-03")) == Some(120.0 + 300.0 * (2.0 / 3.0)))
    assert(got((1L, "2024-04")) == Some(420.0))
    assert(got((2L, "2024-02")) == Some(55.5))
    assert(got.size == 5)
    // within-period pick follows (ts, tie) max — forwardFill's rule
    val dup = obs.union(Seq(
      (1L, ts("2024-04-20 00:00:00"), 9L, 999.0)).toDF("k", "t", "tie", "v"))
    val g2 = TimeSeries.interpolate(dup, Seq("k"), "t", "v", "month",
        Seq("tie")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(7)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(g2((1L, "2024-04")) == Some(999.0))
    assert(g2((1L, "2024-02")) == Some(120.0 + 879.0 * (1.0 / 3.0)))
  }

  test("holt: hand-checked recursion, per-key reset, partition-invariant") {
    val rows = Seq(
      ("a", 1L, 100L), ("a", 2L, 200L), ("a", 3L, 300L),
      ("b", 1L, 50L), ("b", 2L, 50L))
    def run(parts: Int) = TimeSeries.holt(
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, parts)).toDF("k", "t", "v"),
        Seq("k"), "t", col("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    val got = run(1)
    // l2 = .5*200 + .5*100 = 150; b2 = .25*50 = 12.5
    // l3 = .5*300 + .5*162.5 = 231.25; b3 = .25*81.25 + .75*12.5
    assert(got(("a", 1L)) == (100.0, 0.0))
    assert(got(("a", 2L)) == (150.0, 12.5))
    assert(got(("a", 3L)) == (231.25, 29.6875))
    // key b resets: constant series keeps zero trend
    assert(got(("b", 1L)) == (50.0, 0.0))
    assert(got(("b", 2L)) == (50.0, 0.0))
    // input partitioning must not matter (operator repartitions on key)
    assert(run(5) == got)
    // NULL value fails fast with the offending key, not a bare NPE
    val withNull = spark.sql(
      "SELECT * FROM VALUES ('a', 1L, 100L), ('a', 2L, CAST(NULL AS BIGINT)) t(k, t, v)")
    val ex = intercept[org.apache.spark.SparkException] {
      TimeSeries.holt(withNull, Seq("k"), "t", col("v")).collect()
    }
    assert(ex.getCause.getMessage.contains("holt: NULL value at key=a"))
  }
}
