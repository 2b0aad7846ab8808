package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {

  private val rnd = new scala.util.Random(23)

  // intervals with mixed lengths: some shorter than a bin, some spanning
  // many bins, some touching exactly at endpoints
  private def intervals(n: Int, maxLo: Long, maxLen: Long) =
    (0 until n).map { i =>
      val lo = (rnd.nextDouble() * maxLo).toLong
      (i.toLong, lo, lo + (rnd.nextDouble() * maxLen).toLong)
    }

  test("overlapJoin == brute force, each pair exactly once") {
    val xs = intervals(200, 10000, 800)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(xs, 5)).toDF("id", "lo", "hi")
    for (w <- Seq(100L, 512L, 5000L)) {
      val got = IntervalJoin.overlapJoin(df, df, "lo", "hi", w)
        .filter(col("a_id") =!= col("b_id"))
        .select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val ref = for {
        (ai, alo, ahi) <- xs; (bi, blo, bhi) <- xs
        if ai != bi && alo <= bhi && blo <= ahi
      } yield (ai, bi)
      // sequence equality (not sets): a pair sharing k bins must be
      // emitted once, not k times — the report-once ownership rule
      assert(got.sorted == ref.sorted, s"binWidth=$w")
    }
  }

  test("inclusive endpoints: touching intervals overlap") {
    val df = spark.createDataFrame(Seq(
      (1L, 0L, 100L), (2L, 100L, 200L), (3L, 200L, 300L),
      (4L, 301L, 400L))).toDF("id", "lo", "hi")
    val got = IntervalJoin.overlapJoin(df, df, "lo", "hi", 64L)
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact touches (100, 200) overlap; the 1-apart gap (300, 301) doesn't
    assert(got == Set((1L, 2L), (2L, 3L)))
  }

  test("partition-count invariance") {
    val xs = intervals(150, 5000, 600)
    def run(parts: Int) = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(xs, parts)).toDF("id", "lo", "hi")
      IntervalJoin.overlapJoin(df, df, "lo", "hi", 256L)
        .filter(col("a_id") =!= col("b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(3))).sorted.toSeq
    }
    assert(run(2) == run(11))
  }

  test("pointInInterval == brute force, each pair exactly once") {
    val ivs = intervals(150, 8000, 900)
    val pts = (0 until 400).map { i =>
      (1000L + i, (rnd.nextDouble() * 9000).toLong)
    }
    val ivDf = spark.createDataFrame(
      spark.sparkContext.parallelize(ivs, 4)).toDF("id", "lo", "hi")
    val ptDf = spark.createDataFrame(
      spark.sparkContext.parallelize(pts, 3)).toDF("pid", "t")
    for (w <- Seq(64L, 700L, 4096L)) {
      val got = IntervalJoin
        .pointInInterval(ptDf, ivDf, "t", "lo", "hi", w)
        .select("p_pid", "i_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val ref = for {
        (pid, t) <- pts; (id, lo, hi) <- ivs
        if lo <= t && t <= hi
      } yield (pid, id)
      // sequence equality: a point is in ONE bin, so a containing
      // interval spanning k bins must still yield exactly one row
      assert(got.sorted == ref.sorted, s"binWidth=$w")
    }
  }

  test("pointInInterval: inclusive endpoints") {
    val ivDf = spark.createDataFrame(Seq((1L, 100L, 200L)))
      .toDF("id", "lo", "hi")
    val ptDf = spark.createDataFrame(Seq(
      (10L, 99L), (11L, 100L), (12L, 200L), (13L, 201L)))
      .toDF("pid", "t")
    val got = IntervalJoin.pointInInterval(ptDf, ivDf, "t", "lo", "hi", 64L)
      .select("p_pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(11L, 12L))
  }
}
