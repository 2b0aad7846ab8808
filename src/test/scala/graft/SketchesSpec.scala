package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  // 3 groups × overlapping value ranges, values collapsed into triples
  // (DIV: `/` would divide in double and keep every residue distinct)
  // so the sketch genuinely sees repeats; exact counts recomputed below
  private def fixture = spark.range(0, 30000)
    .select(
      concat(lit("g"), pmod(col("id"), lit(3))).as("g"),
      concat(lit("s"), pmod(col("id"), lit(6))).as("sub"),
      concat(lit("v"), expr("id % 10000 DIV 3 * 3")).as("v"))

  test("estimate lands within the lgK=12 error envelope") {
    val exact = fixture.groupBy("g").agg(countDistinct("v").as("x"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.distinctSketch(fixture, Seq("g"), "v")
      .select(col("g"), Sketches.estimate(col("sketch")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (g, e) =>
      val rel = math.abs(e - exact(g)).toDouble / exact(g)
      assert(rel < 0.05, s"group $g: est $e vs exact ${exact(g)}")
    }
  }

  test("union of fine sketches == sketch built directly at coarse level") {
    val direct = Sketches.distinctSketch(fixture, Seq("g"), "v")
      .select(col("g"), Sketches.estimate(col("sketch")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = Sketches.mergeSketches(
        Sketches.distinctSketch(fixture, Seq("g", "sub"), "v"), Seq("g"))
      .select(col("g"), Sketches.estimate(col("sketch")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // register maxima merge losslessly, but the ESTIMATOR differs (a
    // direct sketch keeps the HIP accumulator, a union answers from the
    // composite estimator) — assert a bound far inside the error
    // envelope, not bit equality
    merged.foreach { case (g, e) =>
      val rel = math.abs(e - direct(g)).toDouble / direct(g)
      assert(rel < 0.02, s"group $g: merged $e vs direct ${direct(g)}")
    }
  }

  test("estimates are stable under partitioning and row order (~HIP noise)") {
    def est(df: org.apache.spark.sql.DataFrame) =
      Sketches.distinctSketch(df, Seq("g"), "v")
        .select(col("g"), Sketches.estimate(col("sketch")).as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = est(fixture)
    val b = est(fixture.repartition(11).orderBy(desc("v")))
    // the HIP estimator is insertion-order dependent, so bit equality
    // is NOT guaranteed — but any layout lands inside the error bound
    a.foreach { case (g, e) =>
      assert(math.abs(e - b(g)).toDouble / e < 0.02, s"$a vs $b")
    }
  }

  // --- Count-Min -------------------------------------------------------

  test("CMS estimates are one-sided and within the eps bound") {
    val exact = fixture.groupBy("g", "v").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val probes = exact.keys.toSeq.sortBy(_.toString).take(50)
    val sk = Sketches.freqSketch(fixture, Seq("g"), "v", eps = 0.001)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val total = 10000L // rows per group
    probes.foreach { case (g, v) =>
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(sk(g))
      val e = cms.estimateCount(v)
      assert(e >= exact((g, v)), s"CMS underestimated ($g,$v)")
      assert(e <= exact((g, v)) + (0.001 * total).ceil.toLong * 3,
        s"($g,$v): est $e vs exact ${exact((g, v))}")
    }
  }

  test("CMS merge of fine sketches is bit-identical to the direct build") {
    val direct = Sketches.freqSketch(fixture, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val merged = Sketches.mergeFreqSketches(
        Sketches.freqSketch(fixture, Seq("g", "sub"), "v"), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(direct.keySet == merged.keySet)
    // CMS is linear: counter matrices add, so unlike HLL the merged
    // sketch IS the direct sketch, byte for byte
    direct.foreach { case (g, bytes) =>
      assert(java.util.Arrays.equals(bytes, merged(g)), s"group $g differs")
    }
  }

  test("CMS probe column works and respects nulls") {
    val got = Sketches.freqSketch(fixture, Seq("g"), "v")
      .select(col("g"),
        Sketches.estimateFreq(col("sketch"), lit("v0")).as("e"),
        Sketches.estimateFreq(col("sketch"), lit(null.asInstanceOf[String]))
          .as("n"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) >= 1L)
      assert(r.isNullAt(2))
    }
  }

  test("quantileSample == scala bottom-k-by-hash brute force; " +
      "partitioning-invariant; small groups pass through exactly") {
    import graft.functions.TextFunctions
    val n = 3000
    val rows = (0 until n).map { i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", (i * 37 % 10000).toLong)
    }
    val df = spark.createDataFrame(rows).toDF("id", "grp", "cents")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.quantileSample(d, Seq("grp"), col("cents"), col("id"),
          k = 64, salt = ":t")
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
        .toMap
    val got = run(df)
    assert(got == run(df.repartition(11)), "sample must be partition-free")
    // brute force: jdk md5 48-bit hash, bottom-64 by (hash, value),
    // exact dyadic quartiles over the x4-scaled sample
    def h48(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }
    def quartile(sorted: Array[Long], p: Double): Double = {
      val pos = (sorted.length - 1) * p
      val lo = pos.toInt; val frac = pos - lo
      val v4 = sorted(lo) * 4 * (1 - frac) +
        (if (frac > 0) sorted(lo + 1) * 4 * frac else 0.0)
      v4 / 400.0
    }
    for (g <- Seq("a", "b")) {
      val smp = rows.filter(_._2 == g)
        .map { case (id, _, c) => (h48(s"$id:t"), c) }
        .sorted.take(64).map(_._2).sorted.toArray
      val (ns, p25, p50, p75) = got(g)
      assert(ns == 64L)
      assert(p25 == quartile(smp, 0.25), s"$g p25")
      assert(p50 == quartile(smp, 0.5), s"$g p50")
      assert(p75 == quartile(smp, 0.75), s"$g p75")
    }
    // a group smaller than k IS its own sample: quantiles turn exact
    val tiny = spark.createDataFrame(
      (0 until 9).map(i => (i.toLong, "t", i * 100L))).toDF("id", "grp", "cents")
    // cents 0,100..800 -> exact dollar quartiles 2/4/6
    val t = run(tiny)("t")
    assert(t == ((9L, 2.0, 4.0, 6.0)), t)
  }

  test("portable HLL: raw-branch accuracy at 100k, lossless merge, " +
      "partition invariance") {
    import graft.operators.Sketches
    val spark2 = spark
    import spark2.implicits._
    // 100k distinct values across 4 shards — far past linear counting
    // (4096 registers), so this exercises the RAW harmonic-mean branch
    // the tiny-vocab fixtures never reach
    val n = 100000
    val df = spark.range(n)
      .select((col("id") % 4).cast("string").as("src"),
        concat(lit("val_"), col("id")).as("v"))
    val perShard = Sketches.hllPortableRegisters(df, Seq("src"), "v")
      .withColumn("all", lit("all"))
    val merged = Sketches.hllPortableMerge(perShard, Seq("all"))
    val est = Sketches.hllPortableEstimate(merged, Seq("all"))
      .head().getDouble(1)
    // 1.04/sqrt(4096) ~ 1.6% std error; 5% is ~3 sigma
    assert(math.abs(est - n) / n < 0.05, s"est=$est for n=$n")
    // merged register table == one built directly over the union
    val direct = Sketches.hllPortableRegisters(
      df.withColumn("all", lit("all")), Seq("all"), "v")
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "merge must be lossless vs the direct build")
    // register build is order/partitioning-free: repartitioned input,
    // identical estimate bits
    val est2 = Sketches.hllPortableEstimate(
      Sketches.hllPortableRegisters(
        df.repartition(13).withColumn("all", lit("all")), Seq("all"), "v"),
      Seq("all")).head().getDouble(1)
    assert(est == est2, s"$est != $est2 under repartition")
    // and the tiny-cardinality path stays in linear counting, near-exact
    val small = Sketches.hllPortableEstimate(
      Sketches.hllPortableRegisters(
        spark.range(50).select(lit("g").as("g"),
          concat(lit("s"), col("id")).as("v")),
        Seq("g"), "v"),
      Seq("g")).head().getDouble(1)
    assert(math.abs(small - 50) < 2, s"linear-counting est=$small for 50")
  }
}
