package graft

import graft.functions.{BitmapDistinctCount, Int64Bitmap}
import graft.functions.BitmapDistinctCount.bitmapDistinct
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.ExpandExec
import org.apache.spark.sql.functions._

class BitmapAggSpec extends SparkSpec {

  // ids drawn from 3 regimes: dense small (array->bitmap upgrade),
  // sparse high buckets, and negatives (arithmetic-shift bucketing);
  // every value appears 3x so set-bit idempotence is exercised
  private def fixture = spark.range(0, 30000)
    .select(
      pmod(col("id"), lit(4)).as("g"),
      when(col("id") % 3 === 0, col("id") % 9000)              // dense
        .when(col("id") % 3 === 1, col("id") % 700 * 1000000L) // sparse
        .otherwise(-(col("id") % 500) - 1)                     // negative
        .as("v"))

  test("bitmap distinct == count(distinct) per group, all id regimes") {
    val exact = fixture.groupBy("g").agg(countDistinct("v").as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bm = fixture.groupBy("g").agg(bitmapDistinct(col("v")).as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bm == exact)
  }

  test("results are partitioning- and order-invariant (exact, not a sketch)") {
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(bitmapDistinct(col("v")).as("x"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(fixture) == run(fixture.repartition(13).orderBy(desc("v"))))
  }

  test("multi-distinct plan has no Expand; count(distinct a, b) twin does") {
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        p +: allNodes(a.executedPlan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    def hasExpand(p: SparkPlan): Boolean =
      allNodes(p).exists(_.isInstanceOf[ExpandExec])
    val viaBitmap = fixture.groupBy("g").agg(
      bitmapDistinct(col("v")).as("a"),
      bitmapDistinct(col("v") + 1).as("b"))
    val viaDistinct = fixture.groupBy("g").agg(
      countDistinct(col("v")).as("a"),
      countDistinct(col("v") + 1).as("b"))
    assert(!hasExpand(viaBitmap.queryExecution.executedPlan))
    assert(hasExpand(viaDistinct.queryExecution.executedPlan))
  }

  test("SQL surface: bitmap_distinct_count registered via extensions") {
    GraftExtensions.register(spark)
    fixture.createOrReplaceTempView("bitmap_fixture")
    val viaSql = spark.sql(
      """SELECT g, bitmap_distinct_count(v) AS x
        |FROM bitmap_fixture GROUP BY g""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = fixture.groupBy("g").agg(countDistinct("v").as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == exact)
  }

  test("nulls are ignored; all-null group counts 0") {
    import spark.implicits._
    val df = Seq[(Int, Option[Long])](
      (1, Some(5L)), (1, None), (1, Some(5L)), (2, None))
      .toDF("g", "v")
    val out = df.groupBy("g").agg(bitmapDistinct(col("v")).as("x"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out == Map(1 -> 1L, 2 -> 0L))
  }

  test("bitmap_bytes + bitmap_and_count: pairwise overlap == set brute " +
      "force, all container mode pairs") {
    // segment sizes straddle the 4096 array->bitmap boundary so the
    // pair joins exercise array×array, array×bitmap and bitmap×bitmap
    val segs = Map(
      "small1" -> (0L until 300L by 3).toSet,
      "small2" -> ((0L until 300L by 5).toSet ++ Set(-7L, Long.MaxValue)),
      "big1" -> (0L until 12000L by 2).toSet,
      "big2" -> (0L until 12000L by 3).toSet)
    import spark.implicits._
    val df = segs.toSeq.flatMap { case (k, vs) => vs.map(k -> _) }
      .toDF("seg", "id")
    val bm = df.groupBy("seg")
      .agg(graft.functions.BitmapAggBytes.bitmapBytes(col("id")).as("bm"))
    val a = bm.select(col("seg").as("sa"), col("bm").as("ba"))
    val b = bm.select(col("seg").as("sb"), col("bm").as("bb"))
    val got = a.join(b, col("sa") < col("sb"))
      .select(col("sa"), col("sb"),
        graft.functions.BitmapAndCount.bitmapAndCount(col("ba"), col("bb"))
          .as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val exp = (for {
      x <- segs.keys; y <- segs.keys if x < y
    } yield (x, y) -> (segs(x) & segs(y)).size.toLong).toMap
    assert(got == exp)
  }

  test("SQL surface: bitmap_bytes/bitmap_and_count round-trip") {
    GraftExtensions.register(spark)
    fixture.createOrReplaceTempView("bitmap_fixture2")
    val got = spark.sql(
      """WITH s AS (SELECT g, bitmap_bytes(v) AS bm
        |           FROM bitmap_fixture2 GROUP BY g)
        |SELECT a.g, b.g, bitmap_and_count(a.bm, b.bm) AS n
        |FROM s a JOIN s b ON a.g < b.g""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val rows = fixture.collect().map(r => r.getLong(0) -> r.getLong(1))
    val sets = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).toSet }
    val exp = (for {
      x <- sets.keys; y <- sets.keys if x < y
    } yield (x, y) -> (sets(x) & sets(y)).size.toLong).toMap
    assert(got == exp)
  }

  test("andCardinality is symmetric and bounded by both cardinalities") {
    val rnd = new scala.util.Random(17)
    val a = new Int64Bitmap; val b = new Int64Bitmap
    (1 to 9000).foreach(_ => a.add(rnd.nextLong() % 100000L))
    (1 to 9000).foreach(_ => b.add(rnd.nextLong() % 100000L))
    val ab = a.andCardinality(b)
    assert(ab == b.andCardinality(a))
    assert(ab <= math.min(a.cardinality, b.cardinality))
    assert(a.andCardinality(a) == a.cardinality)
    assert(a.andCardinality(new Int64Bitmap) == 0L)
  }

  test("container round-trip: serialize/deserialize/merge at the 4096 " +
      "array-to-bitmap boundary") {
    val a = new Int64Bitmap
    // exactly ArrayCap entries stay in array mode; one more upgrades
    (0 until 4096).foreach(i => a.add(i.toLong * 2))
    val b = new Int64Bitmap
    (0 until 5000).foreach(i => b.add(i.toLong * 2 + 1))
    b.add(Long.MaxValue); b.add(Long.MinValue); b.add(-1L)
    val aa = Int64Bitmap.fromBytes(a.toBytes)
    val bb = Int64Bitmap.fromBytes(b.toBytes)
    assert(aa.cardinality == 4096 && bb.cardinality == 5003)
    aa.or(bb)
    assert(aa.cardinality == 4096 + 5003)
    assert(aa.contains(Long.MaxValue) && aa.contains(Long.MinValue) &&
      aa.contains(-1L) && aa.contains(0L) && !aa.contains(9999L * 2))
    // deterministic wire bytes regardless of insertion order
    val c = new Int64Bitmap
    (4095 to 0 by -1).foreach(i => c.add(i.toLong * 2))
    assert(java.util.Arrays.equals(a.toBytes, c.toBytes))
  }
}
