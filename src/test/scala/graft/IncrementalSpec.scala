package graft

import graft.operators.Incremental
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  private lazy val sq = spark
  import sq.implicits._

  private def rollup(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g").agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))

  test("applyDelta == direct recompute (inserts, deletes, updates)") {
    val base = Seq(("a", 10L), ("a", 20L), ("b", 5L), ("c", 7L))
      .toDF("g", "v")
    // update a:10 -> 11 (delete + insert), delete b:5 entirely (group
    // vanishes), insert into new group d
    val delta = Seq(
      ("a", 10L, -1), ("a", 11L, 1),
      ("b", 5L, -1),
      ("d", 100L, 1), ("d", 1L, 1)).toDF("g", "v", "sign")
    val got = Incremental.applyDelta(rollup(base), delta, Seq("g"),
        Seq("sv" -> "v"), "n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val effective = Seq(("a", 11L), ("a", 20L), ("c", 7L),
      ("d", 100L), ("d", 1L)).toDF("g", "v")
    val exp = rollup(effective)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == exp)
    assert(!got.exists(_._1 == "b")) // zero-count group dropped
  }

  test("empty delta is the identity") {
    val base = Seq(("a", 1L), ("b", 2L)).toDF("g", "v")
    val delta = Seq.empty[(String, Long, Int)].toDF("g", "v", "sign")
    val got = Incremental.applyDelta(rollup(base), delta, Seq("g"),
      Seq("sv" -> "v"), "n").collect().map(_.toSeq).toSet
    assert(got == rollup(base).collect().map(_.toSeq).toSet)
  }

  test("double-typed sums keep their type and stay exact") {
    val base = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val delta = Seq(("a", 2.0, -1), ("a", 5.0, 1)).toDF("g", "v", "sign")
    val out = Incremental.applyDelta(rollup(base), delta, Seq("g"),
      Seq("sv" -> "v"), "n")
    assert(out.schema("sv").dataType ==
      org.apache.spark.sql.types.DoubleType)
    val r = out.collect().head
    assert(r.getDouble(1) == 6.0 && r.getLong(2) == 2L)
  }

  test("partitioning-invariant") {
    val rnd = new scala.util.Random(7)
    val base = (1 to 300).map(_ =>
      (s"g${rnd.nextInt(5)}", rnd.nextInt(100).toLong)).toDF("g", "v")
    val delta = (1 to 120).map(_ => (s"g${rnd.nextInt(7)}",
      rnd.nextInt(100).toLong, if (rnd.nextBoolean()) 1 else -1))
      .toDF("g", "v", "sign")
    val a = Incremental.applyDelta(rollup(base).repartition(13), delta
      .repartition(3), Seq("g"), Seq("sv" -> "v"), "n")
      .collect().map(_.toSeq).toSet
    val b = Incremental.applyDelta(rollup(base).coalesce(1),
      delta.coalesce(1), Seq("g"), Seq("sv" -> "v"), "n")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
