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

  /** Sequential merge of half-open intervals sorted by lo: the result
    * is tie-order independent (a tied start always lands inside the
    * open island because hi > lo). */
  private def bruteUnion(ivs: Seq[(Long, Long)]): (Long, Long, Long) = {
    var islands = List.empty[(Long, Long)]
    for ((lo, hi) <- ivs.sortBy(_._1)) islands match {
      case (ilo, ihi) :: rest if lo <= ihi =>
        islands = (ilo, math.max(ihi, hi)) :: rest
      case _ => islands = (lo, hi) :: islands
    }
    (ivs.size.toLong, islands.size.toLong,
      islands.map(i => i._2 - i._1).sum)
  }

  private def unionMap(xs: Seq[(Long, Long, Long, Long)], parts: Int = 4)
      : Map[Long, (Long, Long, Long)] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(xs, parts))
      .toDF("k", "id", "lo", "hi")
    IntervalJoin.unionLength(df, Seq("k"), "lo", "hi", Seq("id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("unionLength == sequential merge per key") {
    val xs = (0 until 500).map { i =>
      val lo = (rnd.nextDouble() * 5000).toLong
      ((i % 7).toLong, i.toLong, lo, lo + 1 + (rnd.nextDouble() * 400).toLong)
    }
    val want = xs.groupBy(_._1).view
      .mapValues(g => bruteUnion(g.map(x => (x._3, x._4)))).toMap
    assert(unionMap(xs) == want)
    assert(unionMap(xs, parts = 11) == want) // partition invariance
  }

  test("unionLength: touching intervals merge, contained ones absorb") {
    // [0,10)+[10,20) touch -> one 20-unit island; [30,40) swallows
    // [32,35) (running max must carry 40 past the contained hi=35, or
    // [38,45) would wrongly open a new island); [100,101) stands alone
    val xs = Seq((1L, 1L, 0L, 10L), (1L, 2L, 10L, 20L),
      (1L, 3L, 30L, 40L), (1L, 4L, 32L, 35L), (1L, 5L, 38L, 45L),
      (1L, 6L, 100L, 101L))
    assert(unionMap(xs) == Map(1L -> ((6L, 3L, 36L))))
  }
}
