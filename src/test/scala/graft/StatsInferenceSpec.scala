package graft

import graft.operators.{Privacy, Stats, TimeSeries}
import org.apache.spark.sql.functions._

/** Hand-case coverage for the inference/release layer added in round 4:
  * Mann–Kendall trend, Welch's t, Wilson intervals, cross-correlation,
  * Kaplan–Meier survival, and the privacy audits. */
class StatsInferenceSpec extends SparkSpec {

  test("mannKendall: monotone series hit z=±2.204541, tau=±1") {
    // strictly increasing 5-point series: S = 10, no ties →
    // 18·Var = 5·4·15 = 300, z = 9/√(300/18) = 2.204541, τ_b = 1
    val up = spark.createDataFrame((1 to 5).map(i => ("u", i.toLong,
      (i * 10).toLong))).toDF("g", "day", "v").repartition(3)
    val down = spark.createDataFrame((1 to 5).map(i => ("d", i.toLong,
      (60 - i * 10).toLong))).toDF("g", "day", "v")
    val gotUp = Stats.mannKendall(up, Seq("g"), "day", col("v"))
      .collect().head
    assert(gotUp.getLong(1) == 5L && gotUp.getLong(2) == 10L)
    assert(gotUp.getDouble(3) == 2.204541 && gotUp.getDouble(4) == 1.0)
    val gotDown = Stats.mannKendall(down, Seq("g"), "day", col("v"))
      .collect().head
    assert(gotDown.getLong(2) == -10L)
    assert(gotDown.getDouble(3) == -2.204541 && gotDown.getDouble(4) == -1.0)
  }

  test("mannKendall: constant series has S=0 and NULL z/tau") {
    val flat = spark.createDataFrame((1 to 5).map(i => ("f", i.toLong,
      7L))).toDF("g", "day", "v")
    val r = Stats.mannKendall(flat, Seq("g"), "day", col("v"))
      .collect().head
    assert(r.getLong(2) == 0L && r.isNullAt(3) && r.isNullAt(4))
  }

  test("mannKendall: a single-observation group still reports a row") {
    val df = spark.createDataFrame(Seq(
      ("solo", 1L, 42L), ("pair", 1L, 1L), ("pair", 2L, 2L)))
      .toDF("g", "day", "v")
    val got = Stats.mannKendall(df, Seq("g"), "day", col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.isNullAt(3))).toMap
    assert(got("solo") == ((1L, 0L, true))) // n=1: S=0, NULL stats
    assert(got("pair")._2 == 1L)
  }

  test("mannKendall: partitioning does not change the report") {
    val rnd = new scala.util.Random(11)
    val rows = for (g <- Seq("a", "b"); d <- 1 to 40)
      yield (g, d.toLong, rnd.nextInt(1000).toLong)
    val df = spark.createDataFrame(rows).toDF("g", "day", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.mannKendall(d, Seq("g"), "day", col("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSet
    assert(run(df.repartition(1)) == run(df.repartition(13)))
  }

  test("welchT: hand case A=[1,2,3] B=[5,7,9]") {
    // mA=2 vA=1, mB=7 vB=4 → se² = 1/3+4/3 = 5/3,
    // t = −5/√(5/3) = −3.872983, ν = (5/3)²/(1/18+8/9) = 2.941176
    val df = spark.createDataFrame(Seq(
      ("g", 1L, true), ("g", 2L, true), ("g", 3L, true),
      ("g", 5L, false), ("g", 7L, false), ("g", 9L, false)))
      .toDF("g", "v", "a").repartition(2)
    val r = Stats.welchT(df, Seq("g"), col("v"), col("a")).collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 7.0)
    assert(r.getDouble(5) == -3.872983)
    assert(r.getDouble(6) == 2.941176)
  }

  test("welchT: single-row side reports means but NULL t/df") {
    val df = spark.createDataFrame(Seq(
      ("g", 4L, true), ("g", 5L, false), ("g", 7L, false)))
      .toDF("g", "v", "a")
    val r = Stats.welchT(df, Seq("g"), col("v"), col("a")).collect().head
    assert(r.getDouble(3) == 4.0 && r.getDouble(4) == 6.0)
    assert(r.isNullAt(5) && r.isNullAt(6))
  }

  test("wilsonInterval: k=10/n=100 matches the textbook interval") {
    val df = spark.createDataFrame(
      (1 to 100).map(i => ("g", i <= 10))).toDF("g", "pos")
    val r = Stats.wilsonInterval(df, Seq("g"), col("pos")).collect().head
    assert(r.getLong(1) == 100L && r.getLong(2) == 10L)
    assert(r.getDouble(3) == 0.1)
    assert(math.abs(r.getDouble(4) - 0.0552) < 5e-4) // lo ≈ 0.0552
    assert(math.abs(r.getDouble(5) - 0.1744) < 5e-4) // hi ≈ 0.1744
    assert(r.getDouble(4) > 0 && r.getDouble(5) < 1)
  }

  test("crossCorr: b = a shifted by 2 peaks at lag 2 with xcf 1") {
    val a = Seq(3L, 9L, 1L, 7L, 2L, 8L, 4L, 6L, 5L, 10L)
    val rows =
      a.zipWithIndex.map { case (v, i) => ("a", (i + 1).toLong, v) } ++
        a.zipWithIndex.map { case (v, i) => ("b", (i + 3).toLong, v) }
    val df = spark.createDataFrame(rows).toDF("s", "day", "v")
      .repartition(4)
    val got = TimeSeries.crossCorr(df, "s", "day", "v", maxLag = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got(("a", "b", 2)) == Some(1.0)) // b_{t+2} = a_t exactly
    assert(got(("a", "b", 0)) != Some(1.0))
    // the reverse direction at lag 2 is NOT the aligned one
    assert(got(("b", "a", 2)) != Some(1.0))
  }

  test("kaplanMeier: classic 5-subject curve with censoring") {
    // t=1 death (S=0.8), t=2 censor (0.8), t=3 death (0.533333),
    // t=4 death (0.266667), t=5 censor (0.266667)
    val df = spark.createDataFrame(Seq(
      (1L, true), (2L, false), (3L, true), (4L, true), (5L, false)))
      .toDF("t", "died").repartition(3)
    val got = TimeSeries.kaplanMeier(df, Nil, col("t"), col("died"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(5L, 4L, 3L, 2L, 1L)) // risk sets
    assert(got.map(_._5).toSeq ==
      Seq(0.8, 0.8, 0.533333, 0.266667, 0.266667))
  }

  test("kaplanMeier: a step that kills the risk set zeroes the curve") {
    val df = spark.createDataFrame(Seq(
      (1L, true), (2L, true), (2L, true))).toDF("t", "died")
    val got = TimeSeries.kaplanMeier(df, Nil, col("t"), col("died"))
      .collect().map(r => (r.getLong(0), r.getDouble(4))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 0.666667), (2L, 0.0)))
  }

  test("anovaF: hand case A=[1,2,3] B=[5,7,9] gives F=14.4") {
    // SSW = 2+8 = 10; SSB = 3·round(6.25)·2 = 36 (integer-quantized
    // squares, identical in the twin); F = (36/1)/(10/4) = 14.4
    val df = spark.createDataFrame(Seq(
      ("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 5L), ("B", 7L), ("B", 9L))).toDF("g", "v").repartition(3)
    val r = Stats.anovaF(df, col("g"), col("v")).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L)
    assert(r.getDouble(2) == 14.4)
  }

  test("anovaF: a single level has no between-variance — NULL F") {
    val df = spark.createDataFrame(Seq(("A", 1L), ("A", 5L)))
      .toDF("g", "v")
    val r = Stats.anovaF(df, col("g"), col("v")).collect().head
    assert(r.getLong(0) == 1L && r.isNullAt(2))
  }

  test("spearman: monotone nonlinear is 1; tie-averaged ranks") {
    val mono = spark.createDataFrame(Seq(
      ("m", 1L, 1L), ("m", 2L, 4L), ("m", 3L, 9L), ("m", 4L, 100L)))
      .toDF("g", "x", "y")
    val r1 = Stats.spearman(mono, Seq("g"), col("x"), col("y"))
      .collect().head
    assert(r1.getDouble(2) == 1.0)
    // ties in x: rank2(x) = (3,3,6), rank2(y) = (2,4,6) → 6/√48
    val tied = spark.createDataFrame(Seq(
      ("t", 1L, 10L), ("t", 1L, 20L), ("t", 2L, 30L)))
      .toDF("g", "x", "y").repartition(2)
    val r2 = Stats.spearman(tied, Seq("g"), col("x"), col("y"))
      .collect().head
    assert(r2.getDouble(2) == 0.866025)
  }

  test("psi: symmetric two-bin drift, NULL on one-sided bins") {
    val df = spark.createDataFrame(Seq(
      (1L, true), (1L, true), (2L, true),
      (1L, false), (2L, false), (2L, false),
      (9L, true))).toDF("bin", "a")
    val got = Stats.psi(df, col("bin"), col("a")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // shares exclude nothing: ta=4 (incl. bin 9), tb=3
    // bin1: (2/4 − 1/3)·ln((2·3)/(1·4)) = (1/6)·ln(1.5) = 0.067578
    assert(got(1L)._3 == Some(0.067578))
    assert(got(9L)._3 == None) // no B mass — undefined, surfaced
  }

  test("poissonBootstrap: deterministic band straddling the mean") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 500).map(i => ("g", i.toLong,
      (1000 + rnd.nextInt(500)).toLong))
    val df = spark.createDataFrame(rows).toDF("g", "id", "v")
      .repartition(7)
    def run(salt: String) =
      Stats.poissonBootstrap(df, Seq("g"), col("id"), col("v"),
        b = 64, salt = salt).collect().head
    val r = run("s1")
    assert(r.getLong(1) == 64L) // no empty resamples at n=500
    val (lo, med, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(lo <= med && med <= hi && lo < hi)
    val mean = rows.map(_._3).sum.toDouble / rows.size
    assert(math.abs(med - mean) < 3 * (500 / math.sqrt(12) /
      math.sqrt(500.0))) // med within ~3 se of the sample mean
    val again = run("s1")
    assert((again.getDouble(2), again.getDouble(3), again.getDouble(4))
      == ((lo, med, hi)))                       // idempotent draw
    assert(run("s2").getDouble(3) != med)       // fresh draw per salt
  }

  test("targetEncode: shrinks toward the global mean by support") {
    // cats: a = {10, 20} (mean 15), b = {100} (mean 100); μ = 130/3
    // m=1: enc_a = (30 + 43.333…)/3 = 24.444444;
    //      enc_b = (100 + 43.333…)/2 = 71.666667
    val df = spark.createDataFrame(Seq(
      ("a", 10L), ("a", 20L), ("b", 100L))).toDF("c", "y").repartition(2)
    val got = graft.operators.Features.targetEncode(df, col("c"),
      col("y"), m = 1.0).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("a") == ((2L, 24.444444)))
    assert(got("b") == ((1L, 71.666667)))
    // m = 0 degenerates to the raw category mean
    val raw = graft.operators.Features.targetEncode(df, col("c"),
      col("y"), m = 0.0).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(raw == Map("a" -> 15.0, "b" -> 100.0))
  }

  test("kAnonymityAudit: flags small and non-diverse classes only") {
    val rows =
      (1 to 12).map(i => ("big", i % 2, i)) ++   // k ok, l ok
        (1 to 12).map(i => ("mono", 0, i)) ++    // k ok, l violated
        (1 to 3).map(i => ("tiny", i % 2, i))    // k violated, l ok
    val df = spark.createDataFrame(rows).toDF("q", "sens", "id")
    val got = Privacy.kAnonymityAudit(df, Seq("q"), col("sens"),
      k = 10, l = 2).collect()
      .map(r => r.getString(0) -> (r.getBoolean(3), r.getBoolean(4)))
      .toMap
    assert(got == Map("mono" -> (false, true), "tiny" -> (true, false)))
  }

  test("dpNoisyCounts: deterministic per salt, varies across salts") {
    val df = spark.createDataFrame(
      (1 to 100).map(i => Tuple1(s"g${i % 4}"))).toDF("k")
    def run(salt: String) =
      Privacy.dpNoisyCounts(df, col("k"), epsilon = 0.1, salt = salt)
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getDouble(2))).sortBy(_._1).toSeq
    val a = run("s1")
    assert(a == run("s1"))                       // idempotent release
    assert(a.map(_._3) != run("s2").map(_._3))   // fresh draw per salt
    assert(a.forall(_._2 == 25L))
    assert(a.exists(r => r._3 != r._2.toDouble)) // noise actually lands
  }

  test("dpNoisyCountsOverDomain: exactly the domain, noisy zeros, " +
      "observed-outside-domain dropped") {
    val facts = spark.createDataFrame(
      (1 to 60).map(i => Tuple1(s"g${i % 3}"))).toDF("k") // g0 g1 g2
    val domain = spark.createDataFrame(
      Seq("g0", "g1", "g3", "g3").map(Tuple1(_))).toDF("dim") // no g2; dup g3
    val got = Privacy.dpNoisyCountsOverDomain(facts, col("k"), domain,
        epsilon = 0.1, salt = "s1")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq("g0", "g1", "g3")) // g2 dropped, g3 once
    assert(got.map(_._2).toSeq == Seq(20L, 20L, 0L))     // empty -> true n=0
    assert(got.forall(r => r._3 != r._2.toDouble))       // all rows noised
    // the g3 row's noise matches the observed-path draw for the same
    // salt+dim (one formula, both entry points)
    val viaObserved = Privacy.dpNoisyCounts(
      spark.createDataFrame(Seq(Tuple1("g3"))).toDF("k"),
      col("k"), epsilon = 0.1, salt = "s1")
      .collect().head.getDouble(2) - 1.0
    assert(math.abs(got.find(_._1 == "g3").get._3 - viaObserved) < 2e-6)
  }
}
