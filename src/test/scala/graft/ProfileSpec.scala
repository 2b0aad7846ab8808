package graft

import graft.operators.Profile
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

class ProfileSpec extends SparkSpec {

  private def fixture = {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType),
      StructField("s", StringType)))
    val rows = Seq(
      Row(1L, 2.5, "b"), Row(2L, null, "a"), Row(2L, -1.0, null),
      Row(3L, 7.0, "c"), Row(null, 7.0, "a"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
  }

  test("per-column counts, nulls, distincts, typed min/max") {
    val got = Profile.profile(fixture, Seq("k", "v", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("k", "v", "s"))
    val k = got("k")
    assert(k.getLong(1) == 5 && k.getLong(2) == 4 && k.getLong(3) == 3)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 3.0)
    assert(k.isNullAt(6) && k.isNullAt(7))
    val v = got("v")
    assert(v.getLong(2) == 4 && v.getLong(3) == 3) // 7.0 repeats
    assert(v.getDouble(4) == -1.0 && v.getDouble(5) == 7.0)
    val s = got("s")
    assert(s.getLong(2) == 4 && s.getLong(3) == 3)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) == "a" && s.getString(7) == "c")
  }

  test("approximate distinct path stays within HLL error") {
    val df = spark.range(10000).selectExpr("id % 1000 AS m")
    val r = Profile.profile(df, Seq("m"), exactDistinct = false)
      .collect()(0)
    assert(math.abs(r.getLong(3) - 1000L) <= 100,
      s"approx distinct ${r.getLong(3)} too far from 1000")
    assert(r.getLong(1) == 10000 && r.getLong(2) == 10000)
  }

  test("rejects unsupported column types and duplicate columns") {
    val df = spark.range(3).selectExpr("array(id) AS a")
    intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("a"))
    }
    intercept[IllegalArgumentException] {
      Profile.profile(fixture, Seq("k", "k"))
    }
  }

  test("single aggregate pass: one scan of the input") {
    val plan = Profile.profile(fixture, Seq("k", "v", "s"))
      .queryExecution.executedPlan.toString
    // the Expand-based multi-distinct rewrite keeps it one pass: exactly
    // one scan of the source RDD feeds every per-column statistic
    assert("ScanExistingRDD|Scan ExistingRDD".r
      .findAllIn(plan).size == 1, plan)
  }

  test("keySkew: ranks, shares and totals on a hand-built skew") {
    val rows = Seq.fill(5)(Tuple1("a")) ++ Seq.fill(3)(Tuple1("b")) ++
      Seq(Tuple1("c"), Tuple1("d"))
    val df = spark.createDataFrame(rows).toDF("k")
    val r = Profile.keySkew(df, "k", topK = 3).collect()
      .map(x => x.getInt(0) -> ((x.getString(1), x.getLong(2),
        x.getDouble(3), x.getDouble(4), x.getLong(5), x.getLong(6))))
      .toMap
    assert(r.size == 3) // topK bounds the report
    assert(r(1) == (("a", 5L, 0.5, 0.5, 4L, 10L)))
    assert(r(2) == (("b", 3L, 0.3, 0.8, 4L, 10L)))
    assert(r(3) == (("c", 1L, 0.1, 0.9, 4L, 10L))) // count tie -> key order
  }

  test("keySkew: top-K never plans a global sort") {
    val df = spark.createDataFrame(
      (1 to 100).map(i => Tuple1((i % 7).toString))).toDF("k")
    val plan = Profile.keySkew(df, "k", topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("equiDepthHist: uniform 1..8 quarters into equal buckets") {
    val df = spark.createDataFrame((1 to 8).map(i => Tuple1(i.toLong)))
      .toDF("v")
    val r = Profile.equiDepthHist(df, col("v"), buckets = 4, scale = 1L)
      .collect()
      .map(x => x.getInt(0) -> ((x.getDouble(1), x.getDouble(2),
        x.getLong(3))))
      .toMap
    // quantiles of 1..8 at p=k/4: 1, 2.75, 4.5, 6.25, 8
    assert(r(0) == ((1.0, 2.75, 2L)))
    assert(r(1) == ((2.75, 4.5, 2L)))
    assert(r(2) == ((4.5, 6.25, 2L)))
    assert(r(3) == ((6.25, 8.0, 2L)))
  }

  test("equiDepthHist: all-equal values collapse into the top bucket") {
    val df = spark.createDataFrame(Seq.fill(10)(Tuple1(42L))).toDF("v")
    val r = Profile.equiDepthHist(df, col("v"), buckets = 8, scale = 1L)
      .collect()
    assert(r.length == 1)
    // 42 >= every (equal) interior edge -> the last bucket holds all
    assert(r(0).getInt(0) == 7 && r(0).getLong(3) == 10L)
  }

  test("equiDepthHist rejects non-power-of-two bucket counts") {
    val df = spark.createDataFrame(Seq(Tuple1(1L))).toDF("v")
    intercept[IllegalArgumentException] {
      Profile.equiDepthHist(df, col("v"), buckets = 10)
    }
  }
}
