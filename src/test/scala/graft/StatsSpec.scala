package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {

  test("madOutliers: hand case — median 5, MAD 1, one far point") {
    // group g: values 3,4,5,6,7,100 (cents): median 5.5? n=6 → med is
    // midpoint of 5,6 = 5.5; devs |x-5.5| = 2.5,1.5,.5,.5,1.5,94.5 →
    // MAD = midpoint of sorted devs (.5,.5,1.5,1.5,2.5,94.5) = 1.5;
    // outliers: dev > 3*1.5=4.5 → only 100
    val df = spark.createDataFrame(
      Seq(3, 4, 5, 6, 7, 100).map(v => ("g", v.toLong)))
      .toDF("grp", "cents").repartition(3)
    val got = Stats.madOutliers(df, Seq("grp"), col("cents"), k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(("g", 6L, 1L, 0.015))) // MAD 1.5 cents = 0.015 units
  }

  test("madOutliers: all-equal group has MAD 0 and no outliers") {
    val df = spark.createDataFrame(
      Seq.fill(5)(("h", 42L)) :+ (("h", 42L))).toDF("grp", "cents")
    val got = Stats.madOutliers(df, Seq("grp"), col("cents"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((6L, 0L, 0.0)))
  }

  test("corrMatrix: perfect positive, perfect negative, zero") {
    // x increases 1..4; y = 2x (corr 1); z = -x (corr -1 with x);
    // w alternates independent of x's order? use orthogonal pattern
    val df = spark.createDataFrame(Seq(
      (1L, 2L, -1L, 1L), (2L, 4L, -2L, -1L),
      (3L, 6L, -3L, -1L), (4L, 8L, -4L, 1L)))
      .toDF("x", "y", "z", "w").repartition(2)
    val got = Stats.corrMatrix(df, Seq(
      "x" -> col("x"), "y" -> col("y"), "z" -> col("z"), "w" -> col("w")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("x", "y")) == 1.0)
    assert(got(("x", "z")) == -1.0)
    assert(got(("y", "z")) == -1.0)
    assert(math.abs(got(("x", "w"))) < 0.5) // near-orthogonal
    assert(got.size == 6)
  }

  test("corrMatrix: row order and partitioning do not change results") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 500).map { _ =>
      val x = rnd.nextInt(1000).toLong
      (x, x / 2 + rnd.nextInt(100), rnd.nextInt(50).toLong)
    }
    def run(df: org.apache.spark.sql.DataFrame) =
      Stats.corrMatrix(df, Seq("a" -> col("a"), "b" -> col("b"),
        "c" -> col("c")))
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .toSet
    val df = spark.createDataFrame(rows).toDF("a", "b", "c")
    assert(run(df.repartition(1)) == run(df.repartition(17).orderBy("c")))
  }
}
