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
}
