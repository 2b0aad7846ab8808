package graft

import graft.operators.{Dedup, TimeSeries}
import org.apache.spark.sql.functions._

/** streaks / timeWeightedAvg / dedupSegments — session-4 additions. */
class TimeSeriesStreaksSpec extends SparkSpec {

  test("streaks: islands split on gaps, duplicates collapse") {
    val rows = Seq( // (user, day) with intra-day duplicates
      (1L, 10L), (1L, 10L), (1L, 11L), (1L, 12L), (1L, 14L),
      (2L, 5L), (2L, 7L), (2L, 8L),
      (3L, 100L))
    val got = TimeSeries.streaks(
      spark.createDataFrame(rows).toDF("u", "day").repartition(4),
      Seq("u"), "day")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 10L, 3L), (1L, 14L, 1L),
      (2L, 5L, 1L), (2L, 7L, 2L), (3L, 100L, 1L)))
  }

  test("timeWeightedAvg: LOCF weighting, zero-weight ties, singletons dropped") {
    val rows = Seq(
      // u=1: v=100 for 10 ticks, v=200 for 30 ticks, last value unweighted
      (1L, 0L, 1L, 1.0), (1L, 10L, 2L, 2.0), (1L, 40L, 3L, 9.0),
      // u=2: single observation — zero span, dropped
      (2L, 0L, 4L, 5.0),
      // u=3: tied timestamps — tie order deterministic, dt=0 weight
      (3L, 0L, 5L, 1.0), (3L, 0L, 6L, 7.0), (3L, 10L, 7L, 3.0))
    val got = TimeSeries.timeWeightedAvg(
      spark.createDataFrame(rows).toDF("u", "t", "eid", "v")
        .repartition(3),
      Seq("u"), "t", "v", scale = 100L, tieCols = Seq("eid"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L) == (1.0 * 10 + 2.0 * 30) / 40)
    // u=3: first tied row gets dt=0, second spans the 10 ticks
    assert(got(3L) == 7.0)
  }

  test("dedupSegments: global first occurrence survives, in order") {
    val docs = Seq(
      (1L, "a b c d e f g h"),        // both segments first — intact
      (2L, "a b c d x y z w"),        // first segment seen in doc 1
      (3L, "a b c d e f g h"),        // fully duplicated — disappears
      (4L, "q r s"))                  // short doc, partial segment
    val got = Dedup.dedupSegments(
      spark.createDataFrame(docs).toDF("doc_id", "text").repartition(3),
      "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a b c d e f g h", 2L -> "x y z w",
      4L -> "q r s"))
  }

  test("dedupSegments: intra-doc repeats keep only the first instance") {
    val docs = Seq((7L, "p q r s p q r s t u"))
    val got = Dedup.dedupSegments(
      spark.createDataFrame(docs).toDF("doc_id", "text"),
      "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(7L -> "p q r s t u"))
  }
}
