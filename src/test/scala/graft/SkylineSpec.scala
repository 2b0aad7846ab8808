package graft

import graft.operators.Skyline
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {

  private def brute(pts: Seq[(Long, Double, Double)]): Set[Long] =
    pts.filterNot { case (_, x, y) =>
      pts.exists { case (_, bx, by) =>
        bx <= x && by <= y && (bx < x || by < y)
      }
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Double, Double)], parts: Int): Set[Long] =
    Skyline.pareto(
      spark.createDataFrame(pts).toDF("id", "x", "y").repartition(parts),
      Seq("x", "y"))
      .select("id").collect().map(_.getLong(0)).toSet

  test("matches brute-force dominance on random points, any partitioning") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 400L).map(i =>
      (i, math.floor(rnd.nextDouble() * 50), math.floor(rnd.nextDouble() * 50)))
    val expect = brute(pts)
    assert(expect.nonEmpty && expect.size < pts.size)
    assert(run(pts, 1) == expect)
    assert(run(pts, 7) == expect) // partition-count invariant
  }

  test("coordinate ties survive together; duplicates of a frontier point survive") {
    val pts = Seq(
      (1L, 1.0, 5.0), (2L, 1.0, 5.0), // identical frontier points — both stay
      (3L, 5.0, 1.0),
      (4L, 1.0, 6.0), // dominated by 1/2 (equal x, larger y)
      (5L, 2.0, 2.0))
    assert(run(pts, 3) == Set(1L, 2L, 3L, 5L))
  }

  test("three criteria") {
    val pts = Seq((1L, 1.0, 9.0, 9.0), (2L, 9.0, 1.0, 9.0),
      (3L, 9.0, 9.0, 1.0), (4L, 2.0, 2.0, 2.0), (5L, 9.0, 9.0, 9.0),
      (6L, 2.0, 2.0, 3.0))
    val got = Skyline.pareto(
      spark.createDataFrame(pts).toDF("id", "x", "y", "z").repartition(2),
      Seq("x", "y", "z"))
      .select("id").collect().map(_.getLong(0)).toSet
    // 5 dominated by everything; 6 dominated by 4; the rest incomparable
    assert(got == Set(1L, 2L, 3L, 4L))
  }

  test("maximize via negation") {
    val df = spark.createDataFrame(Seq((1L, 1.0, 10.0), (2L, 2.0, 20.0),
      (3L, 2.0, 5.0))).toDF("id", "price", "size")
      .withColumn("neg_size", -col("size"))
    // cheapest-vs-largest frontier: 3 is beaten by 2 on both axes
    val got = Skyline.pareto(df, Seq("price", "neg_size"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }
}
