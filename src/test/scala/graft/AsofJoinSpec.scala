package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  private def mk(rows: Seq[(Long, Long)], parts: Int = 3) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts)).toDF("user_id", "ts")

  test("backward asof == brute-force latest-at-or-before, per key") {
    val rnd = new scala.util.Random(7)
    val left = (0 until 400).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val right = (0 until 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i * 10L))
    val l = spark.createDataFrame(
      spark.sparkContext.parallelize(left, 4))
      .toDF("user_id", "lts", "lid")
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(right, 4))
      .toDF("user_id", "rts", "rval")

    val got = AsofJoin.backward(l, r, Seq("user_id"), "lts", "rts", Seq("rval"))
      .collect()
      .map(x => (x.getLong(2), (Option(x.get(3)).map(_.asInstanceOf[Long]),
        Option(x.get(4)).map(_.asInstanceOf[Long]))))
      .toMap

    left.foreach { case (k, lts, lid) =>
      val cands = right.filter(x => x._1 == k && x._2 <= lts)
      val exp =
        if (cands.isEmpty) (None, None)
        else {
          // ties on rts resolve toward the greatest payload tuple
          val best = cands.maxBy(c => (c._2, c._3))
          (Some(best._2), Some(best._3))
        }
      assert(got(lid) == exp, s"left row $lid (key=$k, ts=$lts)")
    }
  }

  test("tolerance nulls out matches older than the horizon") {
    val l = mk(Seq((1L, 100L))).withColumnRenamed("ts", "lts")
    val r = spark.createDataFrame(Seq((1L, 40L, 7L), (1L, 90L, 8L)))
      .toDF("user_id", "rts", "v")
    val within = AsofJoin.backward(l, r, Seq("user_id"), "lts", "rts",
      Seq("v"), tolerance = Some(15L)).collect()(0)
    assert(within.getLong(2) == 90L && within.getLong(3) == 8L)
    val outside = AsofJoin.backward(l, r.filter(col("rts") === 40), // 60 away
      Seq("user_id"), "lts", "rts", Seq("v"), tolerance = Some(15L))
      .collect()(0)
    assert(outside.isNullAt(2) && outside.isNullAt(3))
  }

  test("TIMESTAMP ts columns: tolerance is microseconds, sub-second " +
      "precision honored") {
    // left at 10.000500s; right rows at 10.000100s (400 µs back) and
    // 9.0s (1.0005 s back). A cast-to-seconds comparison would truncate
    // both sides to 10 and 9 — tolerance 450 µs would then reject the
    // 400 µs match, and a 1_000_000 µs horizon would wrongly accept the
    // 1.0005 s row (9 >= 10 - 1).
    val l = spark.sql(
      "SELECT 1L AS user_id, timestamp_micros(10000500) AS lts")
    val r = spark.sql(
      """SELECT 1L AS user_id, timestamp_micros(10000100) AS rts, 7L AS v
        |UNION ALL
        |SELECT 1L, timestamp_micros(9000000), 8L""".stripMargin)
    val near = AsofJoin.backward(l, r, Seq("user_id"), "lts", "rts",
      Seq("v"), tolerance = Some(450L)).collect()(0)
    assert(near.getLong(3) == 7L, "400 µs-old match inside a 450 µs horizon")
    val far = AsofJoin.backward(l, r.filter(col("v") === 8), Seq("user_id"),
      "lts", "rts", Seq("v"), tolerance = Some(1_000_000L)).collect()(0)
    assert(far.isNullAt(3), "1.0005 s-old match outside a 1 s horizon")
  }

  test("equal timestamps: right row at ts == left ts matches (inclusive)") {
    val l = mk(Seq((1L, 50L))).withColumnRenamed("ts", "lts")
    val r = spark.createDataFrame(Seq((1L, 50L, 1L), (1L, 50L, 9L)))
      .toDF("user_id", "rts", "v")
    val row = AsofJoin.backward(l, r, Seq("user_id"), "lts", "rts", Seq("v"))
      .collect()(0)
    assert(row.getLong(2) == 50L)
    assert(row.getLong(3) == 9L) // greatest payload wins the tie
  }

  test("NULL keys never match; NULL right timestamps are ignored") {
    val l = spark.createDataFrame(Seq(
        (Option(1L), Option(100L), 1L),
        (Option.empty[Long], Option(100L), 2L)))   // null key left row
      .toDF("user_id", "lts", "lid")
    val r = spark.createDataFrame(Seq(
        (Option(1L), Option(50L), 10L),
        (Option.empty[Long], Option(40L), 20L),    // null key right row
        (Option(1L), Option.empty[Long], 30L)))    // null ts right row
      .toDF("user_id", "rts", "rval")
    val got = AsofJoin.backward(l, r, Seq("user_id"), "lts", "rts", Seq("rval"))
      .collect()
      .map(x => x.getLong(2) -> (Option(x.get(3)), Option(x.get(4)))).toMap
    // left row 1: only the real (key=1, ts=50) row matches — never the
    // null-ts row (which would sort first and shadow nothing) and never
    // a null-key row
    assert(got(1L) == (Some(50L), Some(10L)))
    // left row 2 (null key): left-join row survives with NO match, even
    // though a null-key right row exists
    assert(got(2L) == (None, None))
  }

  test("partition-count invariance") {
    val rnd = new scala.util.Random(11)
    val left = (0 until 200).map(i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(500).toLong, i.toLong))
    val right = (0 until 150).map(i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(500).toLong, i.toLong))
    def run(parts: Int) = {
      val l = spark.createDataFrame(
        spark.sparkContext.parallelize(left, parts)).toDF("user_id", "lts", "lid")
      val r = spark.createDataFrame(
        spark.sparkContext.parallelize(right, parts)).toDF("user_id", "rts", "rv")
      AsofJoin.backward(l, r, Seq("user_id"), "lts", "rts", Seq("rv"))
        .collect().map(x => (x.getLong(2),
          Option(x.get(3)), Option(x.get(4)))).toSet
    }
    assert(run(2) == run(9))
  }
}
