package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {

  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "status", "price")

  test("apply: latest change wins — update, delete, insert, untouched") {
    val changes = Seq(
      // k=1: update then delete (delete is latest → gone)
      (1L, 1L, "U", "a2", 11.0), (1L, 2L, "D", "x", 0.0),
      // k=2: delete then update (update is latest → new payload)
      (2L, 1L, "D", "x", 0.0), (2L, 5L, "U", "b2", 22.0),
      // k=9: insert of a key absent from base
      (9L, 1L, "I", "new", 99.0)
      // k=3, k=4: untouched
    ).toDF("k", "seq", "op", "status", "price")
    val got = Cdc.apply(base, changes, Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((2L, "b2", 22.0), (3L, "c", 30.0), (4L, "d", 40.0),
      (9L, "new", 99.0)))
  }

  test("latestWins ties on seq break deterministically (payload desc)") {
    val changes = Seq(
      (1L, 1L, "U", "aa", 1.0), (1L, 1L, "U", "zz", 2.0)
    ).toDF("k", "seq", "op", "status", "price")
    val got = Cdc.latestWins(changes, Seq("k"), "seq").collect()
    assert(got.length == 1 && got.head.getString(3) == "zz")
    // same result under a different physical partitioning
    val got2 = Cdc.latestWins(changes.repartition(7), Seq("k"), "seq")
      .collect()
    assert(got2.length == 1 && got2.head.getString(3) == "zz")
  }

  test("apply rejects a changes schema that doesn't match the base") {
    val changes = Seq((1L, 1L, "U", "a")).toDF("k", "seq", "op", "status")
    intercept[IllegalArgumentException] {
      Cdc.apply(base, changes, Seq("k"), "seq", "op")
    }
  }

  test("scd2: consecutive repeats collapse; intervals chain; current open") {
    val obs = Seq(
      // key 1: A,A,B,A → three intervals (repeat collapsed)
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
      (1L, "A", 40L, 4L),
      // key 2: single observation → one open interval
      (2L, "Z", 15L, 5L)
    ).toDF("k", "v", "ts", "tb")
    val got = Cdc.scd2(obs, Seq("k"), "v", "ts", Seq("tb"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .toSet
    assert(got == Set(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(40L), false),
      (1L, "A", 40L, None, true),
      (2L, "Z", 15L, None, true)))
  }

  test("scd2 ties on ts use the tie-break column") {
    val obs = Seq((1L, "A", 10L, 2L), (1L, "B", 10L, 1L))
      .toDF("k", "v", "ts", "tb")
    val got = Cdc.scd2(obs, Seq("k"), "v", "ts", Seq("tb"))
      .orderBy("valid_from", "v").collect()
      .map(r => (r.getString(1), r.getBoolean(4)))
    // tb orders B before A → B closed, A current
    assert(got.toSeq == Seq(("A", true), ("B", false)))
  }

  test("snapshotDiff classifies added/removed/changed, hides unchanged") {
    val oldS = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "c")
    val newS = Seq((2L, 20L), (3L, 35L), (4L, 40L)).toDF("k", "c")
    val got = Cdc.snapshotDiff(oldS, newS, Seq("k"), Seq("c"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        Option(r.get(2)), Option(r.get(3)))))
      .toMap
    assert(got == Map(
      1L -> (("removed", Some(10L), None)),
      3L -> (("changed", Some(30L), Some(35L))),
      4L -> (("added", None, Some(40L)))))
    val withUnchanged = Cdc.snapshotDiff(oldS, newS, Seq("k"), Seq("c"),
      includeUnchanged = true).collect()
    assert(withUnchanged.length == 4)
  }

  test("snapshotDiff null payloads compare null-safe") {
    val oldS = Seq((1L, Option.empty[Long]), (2L, Some(5L)))
      .toDF("k", "c")
    val newS = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]))
      .toDF("k", "c")
    val got = Cdc.snapshotDiff(oldS, newS, Seq("k"), Seq("c")).collect()
    // null == null is unchanged; value → null is a change, not a remove
    assert(got.length == 1 && got(0).getLong(0) == 2L &&
      got(0).getString(1) == "changed")
  }

  test("snapshotDiff round-trips through apply") {
    val oldS = Seq((1L, 10L), (2L, 20L), (3L, 30L), (5L, 50L))
      .toDF("k", "c")
    val newS = Seq((2L, 25L), (3L, 30L), (4L, 40L), (5L, 55L))
      .toDF("k", "c")
    // diff re-expressed as a CDC stream folds old into new exactly
    val changes = Cdc.snapshotDiff(oldS, newS, Seq("k"), Seq("c"))
      .select(col("k"), lit(1L).as("seq"),
        when(col("status") === "removed", "D").otherwise("U").as("op"),
        col("new_c").as("c"))
    val applied = Cdc.apply(oldS, changes, Seq("k"), "seq", "op")
    assert(applied.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == newS.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }
}
