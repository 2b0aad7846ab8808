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
