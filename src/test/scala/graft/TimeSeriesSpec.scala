package graft

import graft.operators.TimeSeries
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("monthly spine: gaps filled with last observation, per key") {
    val obs = Seq(
      // key 1: obs in Jan and Apr → Feb/Mar carry Jan's value
      (1L, ts("2024-01-15 00:00:00"), 10.0),
      (1L, ts("2024-04-02 00:00:00"), 40.0),
      // key 2: single month, two obs — later ts wins within the month
      (2L, ts("2024-03-01 08:00:00"), 1.0),
      (2L, ts("2024-03-20 08:00:00"), 2.0)
    ).toDF("k", "t", "v")
    val got = TimeSeries.forwardFill(obs, Seq("k"), "t", "v", "month")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getDouble(2)))
      .toSet
    assert(got == Set(
      (1L, "2024-01-01 00:00:00.0", 10.0),
      (1L, "2024-02-01 00:00:00.0", 10.0),
      (1L, "2024-03-01 00:00:00.0", 10.0),
      (1L, "2024-04-01 00:00:00.0", 40.0),
      (2L, "2024-03-01 00:00:00.0", 2.0)))
  }

  test("day spine with ts ties broken by tie column") {
    val obs = Seq(
      (1L, ts("2024-01-01 12:00:00"), 7L, 100.0),
      (1L, ts("2024-01-01 12:00:00"), 9L, 200.0), // higher tie wins
      (1L, ts("2024-01-03 00:00:00"), 1L, 300.0)
    ).toDF("k", "t", "tb", "v")
    val got = TimeSeries
      .forwardFill(obs, Seq("k"), "t", "v", "day", Seq("tb"))
      .orderBy("period").collect().map(_.getDouble(2)).toSeq
    assert(got == Seq(200.0, 200.0, 300.0))
  }

  test("unsupported unit rejected") {
    val obs = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      TimeSeries.forwardFill(obs, Seq("k"), "t", "v", "year")
    }
  }
}
