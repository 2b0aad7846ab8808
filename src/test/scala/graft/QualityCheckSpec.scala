package graft

import graft.operators.QualityCheck
import graft.operators.QualityCheck._
import org.apache.spark.sql.functions._

class QualityCheckSpec extends SparkSpec {

  // id, key (nullable), v (nullable), grp — hand-countable violations
  private def df = spark.createDataFrame(Seq(
    (1L, Option(10L), Option(5.0), "a"),
    (2L, Option(10L), Option(50.0), "a"),  // v out of range; dup key 10
    (3L, Option(20L), None, "b"),          // null v
    (4L, None, Option(-1.0), "b"),         // null key; v out of range
    (5L, Option(99L), Option(7.0), "c")    // dangling ref
  )).toDF("id", "k", "v", "grp")

  private def ref = spark.createDataFrame(Seq(
    Tuple1(10L), Tuple1(20L), Tuple1(30L)
  )).toDF("rk")

  private def run(cs: Seq[Constraint]): Map[String, Long] =
    QualityCheck.report(df, cs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("every constraint kind counts its violations exactly") {
    val got = run(Seq(
      NotNull("k"),
      NotNull("id"),
      InRange("v", 0.0, 10.0),
      Satisfies("v_positive", col("v") > 0),
      Unique(Seq("k")),
      ReferentialTo(ref, "k", "rk")))
    assert(got == Map(
      "not_null(k)" -> 1L,
      "not_null(id)" -> 0L,
      "in_range(v,0.0,10.0)" -> 2L,    // 50.0 and -1.0; NULL not counted
      "satisfies(v_positive)" -> 2L,   // -1.0 fails, NULL is unprovable
      "unique(k)" -> 2L,               // both rows of key 10
      "ref(k->rk)" -> 1L               // 99 dangles; NULL key exempt
    ), got.toString)
  }

  test("row-local checks fuse into one aggregate pass (plan-pinned)") {
    val rep = QualityCheck.report(df,
      Seq(NotNull("k"), InRange("v", 0.0, 10.0), Satisfies("p", col("v") > 0)))
    val p = rep.queryExecution.executedPlan.toString
    assert(!p.contains("Union"), s"row-local checks must share one pass:\n$p")
    assert("HashAggregate".r.findAllIn(p).size <= 2, // partial + final
      s"expected one two-phase aggregate:\n$p")
    assert(rep.count() == 3)
  }

  test("empty table reports zeros, not NULL sums") {
    val empty = df.filter(col("id") < 0)
    val got = QualityCheck.report(empty,
        Seq(NotNull("k"), InRange("v", 0.0, 10.0), Unique(Seq("k"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 0L), got.toString)
  }

  test("clean table reports zeros; guards reject bad specs") {
    val got = run(Seq(NotNull("id"), Unique(Seq("id")),
      ReferentialTo(spark.range(0, 10).toDF("rk"), "id", "rk")))
    assert(got("not_null(id)") == 0L && got("unique(id)") == 0L)
    assert(got("ref(id->rk)") == 0L)
    assertThrows[IllegalArgumentException] { run(Nil) }
    assertThrows[IllegalArgumentException] {
      run(Seq(NotNull("k"), NotNull("k")))
    }
  }
}
