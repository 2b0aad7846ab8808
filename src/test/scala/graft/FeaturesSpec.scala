package graft

import graft.operators.Features
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {

  // cutoff 1000; windows: "w" = 100 (ts >= 900), "x" = 500 (ts >= 500)
  private val cutoff = 1000L
  private val wins = Seq("w" -> 100L, "x" -> 500L)

  test("snapshot: hand-checked boundaries, cutoff-exclusive, window-inclusive") {
    val rows = Seq(
      // user 1: one event exactly at the window edge (900 — in w),
      // one below it (899 — only x), one at the cutoff (excluded)
      (1L, 900L, 10L), (1L, 899L, 20L), (1L, 1000L, 40L),
      // user 2: everything ancient (life only)
      (2L, 100L, 7L),
      // user 3: only post-cutoff events → no row at all
      (3L, 1500L, 9L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3)).toDF("u", "ts", "cents")
    val got = Features.snapshot(df, "u", "ts", cutoff, wins, col("cents"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L))
    val u1 = got(1L)
    assert(u1.getLong(1) == 100L)            // recency: 1000 - 900
    assert(u1.getLong(2) == 2 && u1.getLong(3) == 30L)  // life: 900+899
    assert(u1.getLong(4) == 1 && u1.getLong(5) == 10L)  // w: just ts=900
    assert(u1.getLong(6) == 2 && u1.getLong(7) == 30L)  // x: both
    val u2 = got(2L)
    assert(u2.getLong(1) == 900L && u2.getLong(2) == 1)
    assert(u2.getLong(4) == 0 && u2.getLong(5) == 0L)
  }

  test("snapshot: partitioning-invariant; rejects bad windows") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 300).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(2000).toLong, rnd.nextInt(100).toLong))
    def run(parts: Int) = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts)).toDF("u", "ts", "c")
      Features.snapshot(df, "u", "ts", cutoff, wins, col("c"))
        .collect().map(_.toSeq).toSet
    }
    assert(run(1) == run(7))
    val df = spark.createDataFrame(rows).toDF("u", "ts", "c")
    intercept[IllegalArgumentException] {
      Features.snapshot(df, "u", "ts", cutoff, Seq.empty, col("c"))
    }
    intercept[IllegalArgumentException] {
      Features.snapshot(df, "u", "ts", cutoff,
        Seq("a" -> 10L, "a" -> 20L), col("c"))
    }
  }

  test("snapshot is ONE aggregate pass: single scan, no joins") {
    val df = spark.createDataFrame(
      Seq((1L, 10L, 1L))).toDF("u", "ts", "c")
    val exec = Features.snapshot(df, "u", "ts", cutoff, wins, col("c"))
      .queryExecution.executedPlan
    def leaves(p: org.apache.spark.sql.execution.SparkPlan): Int =
      if (p.children.isEmpty && p.innerChildren.isEmpty) 1
      else (p.children ++ p.innerChildren.collect {
        case s: org.apache.spark.sql.execution.SparkPlan => s
      }).map(leaves).sum
    assert(!exec.toString.contains("Join"), exec.toString)
    assert(leaves(exec) == 1, s"expected one scan leaf:\n$exec")
  }

  test("quantileNormalize: pooled mapping, distributions align exactly") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.col
    // group a shifted by +100 vs group b: after QN both groups carry
    // the SAME multiset of pooled values at matching rank positions
    val rows = Seq(
      ("a", 1L, 110L), ("a", 2L, 120L), ("a", 3L, 130L),
      ("b", 4L, 10L), ("b", 5L, 20L), ("b", 6L, 30L))
    val out = graft.operators.Features.quantileNormalize(
        rows.toDF("g", "id", "v"), "g", "id", col("v"))
      .collect()
    val got = out.map(r => r.getLong(1) -> r.getLong(3)).toMap
    // pool sorted: 10,20,30,110,120,130 (N=6); r in 1..3, n=3 ->
    // gidx = ceil(rN/n) = 2,4,6 for both groups
    assert(got == Map(1L -> 20L, 2L -> 110L, 3L -> 130L,
      4L -> 20L, 5L -> 110L, 6L -> 130L))
    val byG = out.groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(3)).sorted.toSeq }
    assert(byG("a") == byG("b"))
  }

  test("meanPoolEmbeddings: hand-checked means, partitioning-invariant") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq(
      (1L, Seq(1.0f, 2.0f)), (1L, Seq(3.0f, 4.0f)), (1L, Seq(5.0f, 0.0f)),
      (2L, Seq(0.5f, -0.5f)))
    def pooled(parts: Int) = graft.operators.Features.meanPoolEmbeddings(
        spark.createDataFrame(spark.sparkContext.parallelize(rows, parts))
          .toDF("doc", "vec"), "doc", "vec")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    val got = pooled(1)
    assert(got((1L, 0)) == ((3.0, 3L)) && got((1L, 1)) == ((2.0, 3L)))
    assert(got((2L, 0)) == ((0.5, 1L)) && got((2L, 1)) == ((-0.5, 1L)))
    // exact integer sums make the pooled doubles partitioning-free
    assert(pooled(4) == got)
  }
}
