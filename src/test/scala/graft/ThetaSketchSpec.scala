package graft

import graft.functions.KmvSketchAgg.kmvSketch
import graft.functions.KmvDistinctEstimate.kmvEstimate
import graft.functions.KmvIntersectEstimate.kmvIntersect
import org.apache.spark.sql.functions._

class ThetaSketchSpec extends SparkSpec {

  private val D = graft.functions.KmvIntersectEstimate.Md5Domain

  // the engine's md5-prefix 60-bit hash bridge
  private def h60(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  test("sketch state is a pure set function: partitioning/order/dup " +
      "invariant, bit-identical") {
    val df = spark.range(0, 20000)
      .select(pmod(col("id"), lit(3)).as("g"),
        (col("id") % 5000).as("v")) // every value seen 4x
    def run(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("g").agg(kmvSketch(h60(col("v")), 128).as("sk"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val a = run(df.repartition(17))
    val b = run(df.coalesce(1).orderBy(desc("v")))
    assert(a == b)
    a.values.foreach { sk =>
      assert(sk.size == 128 && sk == sk.sorted && sk.distinct == sk)
    }
  }

  test("not-full sketches estimate exactly; full sketches stay within " +
      "KMV error bounds") {
    val df = spark.range(0, 10000).select(
      when(col("id") < 40, lit("small")).otherwise(lit("big")).as("g"),
      col("id").as("v"))
    val got = df.groupBy("g")
      .agg(kmvSketch(h60(col("v")), 64).as("sk"))
      .select(col("g"), kmvEstimate(col("sk"), 64).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("small") == 40.0) // below k: exact by construction
    // k=64 -> relative standard error ~1/sqrt(62) ~ 12.7%; 4 RSE bound
    assert(math.abs(got("big") / 9960.0 - 1.0) < 0.51,
      s"estimate ${got("big")} too far from 9960")
  }

  test("intersection: exact when not full, bounded error when full, " +
      "zero for disjoint") {
    import spark.implicits._
    // groups: x = {0..29}, y = {10..39} -> overlap 20 (not full, exact);
    // p = {0..4999}, q = {2500..7499} -> overlap 2500 (full, estimated);
    // d1 = {0..999}, d2 = {5000..5999} -> disjoint (estimate must be 0)
    val rows =
      (0L until 30L).map("x" -> _) ++ (10L until 40L).map("y" -> _) ++
      (0L until 5000L).map("p" -> _) ++ (2500L until 7500L).map("q" -> _) ++
      (0L until 1000L).map("d1" -> _) ++ (5000L until 6000L).map("d2" -> _)
    val sk = rows.toDF("g", "v").groupBy("g")
      .agg(kmvSketch(h60(col("v")), 64).as("sk"))
    val a = sk.select(col("g").as("ga"), col("sk").as("ska"))
    val b = sk.select(col("g").as("gb"), col("sk").as("skb"))
    val got = a.join(b, col("ga") < col("gb"))
      .select(col("ga"), col("gb"),
        kmvIntersect(col("ska"), col("skb"), 64).as("est"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got(("x", "y")) == 20.0) // neither full: exact
    assert(got(("d1", "d2")) == 0.0)
    // full x full with true overlap 2500: KMV intersection error is
    // larger than the distinct estimator's; allow a wide 3x band
    val pq = got(("p", "q"))
    assert(pq > 2500.0 / 3 && pq < 2500.0 * 3, s"p-q estimate $pq")
  }

  test("merge == direct build (sketch of a union is the union of " +
      "sketches)") {
    import spark.implicits._
    val left = (0L until 3000L).map(v => ("u", v))
    val right = (1500L until 4500L).map(v => ("u", v))
    val direct = (left ++ right).toDF("g", "v").groupBy("g")
      .agg(kmvSketch(h60(col("v")), 96).as("sk"))
      .collect().head.getSeq[Long](1)
    // two pre-aggregated halves merged by a second aggregate round trip
    val halves = left.toDF("g", "v").groupBy("g")
      .agg(kmvSketch(h60(col("v")), 96).as("sk"))
      .unionAll(right.toDF("g", "v").groupBy("g")
        .agg(kmvSketch(h60(col("v")), 96).as("sk")))
      .select(col("g"), explode(col("sk")).as("hv"))
      .groupBy("g").agg(kmvSketch(col("hv"), 96).as("sk"))
      .collect().head.getSeq[Long](1)
    assert(direct == halves)
  }

  test("SQL surface: kmv functions registered via extensions") {
    GraftExtensions.register(spark)
    spark.range(0, 2000)
      .select(pmod(col("id"), lit(2)).as("g"), col("id").as("v"))
      .createOrReplaceTempView("kmv_fixture")
    val got = spark.sql(
      """WITH s AS (SELECT g,
        |    kmv_sketch(CAST(conv(substr(md5(CAST(v AS STRING)), 1, 15),
        |      16, 10) AS BIGINT), 64) AS sk
        |  FROM kmv_fixture GROUP BY g)
        |SELECT a.g, b.g, kmv_estimate(a.sk, 64) AS ea,
        |  kmv_intersect_estimate(a.sk, b.sk, 64) AS eb
        |FROM s a JOIN s b ON a.g < b.g""".stripMargin).collect()
    assert(got.length == 1)
    val est = got.head.getDouble(2)
    assert(est > 500 && est < 2000) // ~1000 distinct evens
    assert(got.head.getDouble(3) == 0.0) // evens/odds disjoint
  }
}
