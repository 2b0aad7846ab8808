package graft

import graft.functions.{VectorExpressions, VectorOps}
import org.apache.spark.sql.functions._

import scala.util.Random

/** The codegen'd Catalyst kernels must agree exactly with the pure-built-in
  * fold (same double accumulation order), and with a plain Scala loop. */
class VectorFunctionsSpec extends SparkSpec {

  test("squaredL2 / dot: custom expression == built-in fold == scala loop") {
    val rnd = new Random(42)
    val cases = (1 to 20).map { _ =>
      val n = 1 + rnd.nextInt(16)
      (Seq.fill(n)(rnd.nextFloat() * 2000f - 1000f),
        Seq.fill(n)(rnd.nextFloat() * 2000f - 1000f))
    }
    val df = spark.createDataFrame(cases).toDF("a", "b")
    val rows = df.select(
      col("a"), col("b"),
      VectorExpressions.squaredL2(col("a"), col("b")).as("d2e"),
      VectorOps.dist2(col("a"), col("b")).as("d2f"),
      VectorExpressions.dotProduct(col("a"), col("b")).as("dpe"),
      VectorOps.dot(col("a"), col("b")).as("dpf")).collect()
    rows.foreach { row =>
      val a = row.getSeq[Float](0); val b = row.getSeq[Float](1)
      var d2 = 0.0; var dp = 0.0
      a.zip(b).foreach { case (x, y) =>
        val d = x.toDouble - y.toDouble; d2 += d * d
        dp += x.toDouble * y.toDouble
      }
      assert(row.getDouble(2) == d2) // bit-exact: same fold order
      assert(row.getDouble(3) == d2)
      assert(row.getDouble(4) == dp)
      assert(row.getDouble(5) == dp)
    }
  }

  test("withinEps == (squaredL2 <= eps2) on random, boundary, and NaN input") {
    val rnd = new Random(7)
    val rows = (1 to 200).map { _ =>
      val n = 1 + rnd.nextInt(16)
      (Seq.fill(n)(rnd.nextFloat() * 20f - 10f),
        Seq.fill(n)(rnd.nextFloat() * 20f - 10f))
    } ++ Seq(
      (Seq(1f, 2f, 3f), Seq(1f, 2f)),               // mismatched lengths
      (Seq(Float.NaN, 0f), Seq(0f, 0f)),            // NaN -> never within
      (Seq(0f, Float.NaN), Seq(0f, 0f)),            // NaN after early dims
      (Seq(3f, 4f), Seq(0f, 0f)))                   // d2 == 25 exactly
    val df = spark.createDataFrame(rows).toDF("a", "b").repartition(5)
    for (eps2 <- Seq(0.0, 25.0, 100.0, 1e-6)) {
      val got = df.select(
        VectorExpressions.withinEps(col("a"), col("b"), eps2).as("w"),
        (VectorExpressions.squaredL2(col("a"), col("b")) <= lit(eps2)).as("e"))
        .collect()
      got.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1),
        s"withinEps disagrees with squaredL2<=$eps2"))
    }
    // boundary: d2 == eps2 exactly must be WITHIN (<=, reference dbscan
    // membership is inclusive)
    val b = spark.createDataFrame(Seq((Seq(3f, 4f), Seq(0f, 0f)))).toDF("a", "b")
      .select(VectorExpressions.withinEps(col("a"), col("b"), 25.0))
      .collect()(0).getBoolean(0)
    assert(b)
    // interpreted eval path agrees with codegen
    val w = functions.WithinEps(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3f, 4f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0f, 0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)),
      24.999999)
    assert(w.eval(null) == false)
    intercept[IllegalArgumentException] {
      functions.WithinEps(w.left, w.right, Double.NaN)
    }
  }

  test("expressions survive codegen inside a filter over many rows") {
    val df = spark.range(0, 1000).select(
      col("id"),
      array((0 until 4).map(i => (col("id") * (i + 1)).cast("float")): _*).as("v"))
    val c = df.filter(
      VectorExpressions.squaredL2(col("v"), col("v")) === lit(0.0)).count()
    assert(c == 1000)
    // dot(v,v) = id^2 * (1+4+9+16)
    val s = df.select(sum(VectorExpressions.dotProduct(col("v"), col("v"))))
      .collect()(0).getDouble(0)
    val exp = (0 until 1000).map(i => i.toDouble * i * 30).sum
    assert(s == exp)
  }

  test("TopKByScore aggregate == window top-k (incl. merge across partitions)") {
    val rnd = new Random(11)
    val rows = (0 until 5000).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(10000).toLong, rnd.nextDouble() * 100))
    val df = spark.createDataFrame(rows).toDF("g", "id", "score")
      .repartition(13).persist()
    val agg = df.groupBy("g")
      .agg(graft.functions.TopKByScore.topkMin(col("id"), col("score"), 7).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("pos", "p")))
      .select(col("g"), col("p.id").as("id"), (col("pos") + 1).as("rnk"))
      .collect().map(r => (r.getLong(0), r.getInt(2).toLong) -> r.getLong(1)).toMap
    val win = df.withColumn("rnk", org.apache.spark.sql.functions.row_number()
        .over(org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("score"), col("id"))))
      .filter(col("rnk") <= 7)
      .collect().map(r => (r.getLong(0), r.getInt(3).toLong) -> r.getLong(1)).toMap
    assert(agg == win)
    df.unpersist()
  }

  test("GraftExtensions registers SQL functions usable from spark.sql") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT squared_l2(array(1.0F, 2.0F), array(4.0F, 6.0F)) AS d2,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |       shingles('a b c d', 3) AS sh,
        |       shingles_all('a b a b', 2) AS sa""".stripMargin).collect()(0)
    assert(row.getDouble(0) == 25.0)
    assert(row.getDouble(1) == 11.0)
    assert(row.getSeq[String](2) == Seq("a b c", "b c d"))
    assert(row.getSeq[String](3) == Seq("a b", "b a", "a b"))

    val rowW = spark.sql(
      """SELECT within_eps(array(1.0F, 2.0F), array(4.0F, 6.0F), 25.0) AS w1,
        |       within_eps(array(1.0F, 2.0F), array(4.0F, 6.0F), 24.9) AS w2"""
        .stripMargin).collect()(0)
    assert(rowW.getBoolean(0) && !rowW.getBoolean(1))

    val rowR = spark.sql(
      """SELECT redact_tokens('a secret b', array('secret'), '<X>') AS r,
        |       redact_count('secret a secret', array('secret')) AS n"""
        .stripMargin).collect()(0)
    assert(rowR.getString(0) == "a <X> b" && rowR.getInt(1) == 2)

    val row2 = spark.sql(
      """SELECT posting_pairs(array(1L, 2L, 3L)) AS pp,
        |       posting_pairs_sz(array(struct(1L, 10L), struct(2L, 4L)), 0.5) AS ps,
        |       winnowing_fingerprints('abcdefg', 3, 2) AS wf""".stripMargin)
      .collect()(0)
    assert(row2.getSeq[org.apache.spark.sql.Row](0).map(r =>
      (r.getLong(0), r.getLong(1))) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    // (10, 4) fails the length filter at t=0.5 (4 < 0.5*10... no: 4 >= 5
    // is false) -> no pairs survive
    assert(row2.getSeq[org.apache.spark.sql.Row](1).isEmpty)
    assert(row2.getSeq[Long](2).nonEmpty)
  }

  test("TopKByScore: NaN scores sort last and never evict real neighbors") {
    // primitive > / == comparisons are always false against NaN, which
    // would let a NaN candidate overwrite the heap root
    val rows = Seq((1L, 0.3), (2L, Double.NaN), (3L, 0.1), (4L, Double.NaN),
      (5L, 0.2), (6L, -0.0), (7L, 0.0))
    val df = spark.createDataFrame(rows.map { case (i, s) => (0L, i, s) })
      .toDF("g", "id", "score")
    val got = df.groupBy("g")
      .agg(graft.functions.TopKByScore.topkMin(col("id"), col("score"), 4).as("t"))
      .select(posexplode(col("t")).as(Seq("pos", "p")))
      .select(col("p.id")).collect().map(_.getLong(0)).toSeq
    // ±0.0 tie -> id order (6 before 7); NaN never enters the top 4
    assert(got == Seq(6L, 7L, 3L, 5L))
  }

  test("extension injection path constructs valid function metadata") {
    // ExpressionInfo's long constructor VALIDATES group/source — build the
    // whole injection list the way .withExtensions would consume it
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // throws on invalid metadata
    assert(GraftExtensions.functions.map(_._1.funcName).toSet == Set(
      "squared_l2", "dot_product", "shingles", "shingles_all",
      "posting_pairs", "posting_pairs_sz", "winnowing_fingerprints",
      "within_eps", "redact_tokens", "redact_count",
      "bitmap_distinct_count", "bitmap_bytes", "bitmap_and_count",
      "kmv_sketch", "kmv_estimate", "kmv_intersect_estimate",
      "int8_quant_stats"))
  }

  test("nearestCentroidId == least(struct(d2, c_id)) literal argmin") {
    val rnd = new Random(11)
    val dims = 7
    val cents = (1 to 9).map(cid =>
      (cid, Array.fill(dims)(rnd.nextDouble() * 10 - 5))).toArray
    val vecs = Seq.fill(50)(Seq.fill(dims)(rnd.nextFloat() * 10f - 5f))
    val df = spark.createDataFrame(vecs.map(Tuple1(_))).toDF("v")
    val viaKernel = df
      .select(VectorExpressions.nearestCentroidId(col("v"), cents).as("c"))
      .collect().map(_.getInt(0)).toSeq
    val structs = cents.toSeq.map { case (cid, cv) =>
      struct(
        VectorExpressions.squaredL2(col("v"), typedlit(cv.toSeq)).as("d2"),
        lit(cid).as("c_id"))
    }
    val viaLeast = df.select(least(structs: _*).getField("c_id").as("c"))
      .collect().map(_.getInt(0)).toSeq
    assert(viaKernel == viaLeast)
    // tie resolves to the SMALLEST centroid id: duplicate centroids
    val dup = Array((3, Array(1.0, 2.0)), (7, Array(1.0, 2.0)))
    val one = spark.createDataFrame(Seq(Tuple1(Seq(1.0f, 2.0f)))).toDF("v")
    assert(one.select(VectorExpressions.nearestCentroidId(col("v"), dup))
      .head.getInt(0) == 3)
  }

  test("int8QuantStats: hand case, zero vector, null element") {
    // [1, -0.5, 0]: amax=1, scale=1/127; q = [127, -63, 0]
    val df = spark.createDataFrame(
      Seq(Tuple1(Seq(1.0f, -0.5f, 0.0f)))).toDF("v")
    val got = df.select(VectorExpressions.int8QuantStats(col("v")))
      .head.getSeq[Long](0)
    val scale = 1.0 / 127.0
    def err(v: Double, q: Long): Long = {
      val d = v - q * scale
      math.floor(d * d * 1.0e12 + 0.5).toLong
    }
    assert(got == Seq(3L, 127L - 63L, 127L + 63L,
      err(1.0, 127) + err(-0.5, -63) + err(0.0, 0)))
    // all-zero vector: zero codes, zero error — no division blow-up
    val z = spark.createDataFrame(Seq(Tuple1(Seq(0.0f, 0.0f)))).toDF("v")
    assert(z.select(VectorExpressions.int8QuantStats(col("v")))
      .head.getSeq[Long](0) == Seq(2L, 0L, 0L, 0L))
    // a null ELEMENT nulls the whole report
    val withNull = spark.sql("SELECT array(1.0D, CAST(NULL AS DOUBLE)) AS v")
    assert(withNull.select(VectorExpressions.int8QuantStats(col("v")))
      .head.isNullAt(0))
    // interpreted eval == codegen (DataFrame path)
    val interp = graft.functions.Int8QuantStats(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0f, -0.5f, 0.0f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType))).eval(null)
    assert(interp.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
      == got)
    // non-array input fails at ANALYSIS (SQL surface), not as a
    // ClassCastException at execution
    GraftExtensions.register(spark)
    val aex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT int8_quant_stats(42)").collect()
    }
    assert(aex.getMessage.contains("int8_quant_stats needs array"))
  }

  test("topNCentroidIds: nearest-first by (d2, id), ties keep the " +
      "smaller id, head == nearestCentroidId; interpreted == codegen") {
    // id 4 duplicates id 2's coordinates — every vector ties exactly
    // between them, and the ascending-id scan must keep 2 first
    val cents: Array[(Int, Array[Double])] = Array(
      1 -> Array(0.0, 0.0), 2 -> Array(1.0, 0.25), 3 -> Array(0.0, 1.0),
      4 -> Array(1.0, 0.25), 7 -> Array(0.5, 0.5))
    val rnd = new Random(5)
    val rows = (0 until 300).map(_ =>
      Tuple1(Seq.fill(2)(rnd.nextFloat() * 2f - 0.5f)))
    val df = spark.createDataFrame(rows).toDF("v")
    val got = df.select(col("v"),
      VectorExpressions.topNCentroidIds(col("v"), cents, 3).as("top"),
      VectorExpressions.nearestCentroidId(col("v"), cents).as("n1"))
      .collect()
    def d2(v: Seq[Float], c: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) {
        val d = v(i).toDouble - c(i); acc += d * d; i += 1
      }
      acc
    }
    got.foreach { r =>
      val v = r.getSeq[Float](0)
      val exp = cents.map { case (id, c) => (id, d2(v, c)) }
        .sortBy { case (id, d) => (d, id) }.take(3).map(_._1).toSeq
      assert(r.getSeq[Int](1) == exp, s"top-3 for $v")
      assert(r.getSeq[Int](1).head == r.getInt(2),
        s"top-1 disagrees with nearestCentroidId for $v")
    }
    // n beyond the centroid count clamps to a full ranking
    val all = df.limit(5)
      .select(VectorExpressions.topNCentroidIds(col("v"), cents, 99))
      .collect()
    all.foreach(r => assert(r.getSeq[Int](0).sorted == Seq(1, 2, 3, 4, 7)))
    // interpreted eval path agrees with the codegen (DataFrame) path
    val interp = graft.functions.TopNCentroidIds(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(0.9f, 0.3f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      cents.map(_._2), cents.map(_._1), 3).eval(null)
    val expInterp = cents.map { case (id, c) => (id, d2(Seq(0.9f, 0.3f), c)) }
      .sortBy { case (id, d) => (d, id) }.take(3).map(_._1).toSeq
    assert(interp.asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData].toIntArray().toSeq
      == expInterp)
  }

  test("cellId buckets points to floor(x/eps) per selected dim") {
    val rnd = new Random(7)
    val cases = (1 to 15).map { _ =>
      (Seq.fill(1 + rnd.nextInt(8))(rnd.nextFloat() * 100f - 50f),
        0.5 + rnd.nextDouble() * 50.0)
    }
    cases.foreach { case (v, eps) =>
      val df = spark.createDataFrame(Seq(Tuple1(v))).toDF("v")
      val cells = df.select(VectorOps.cellId(col("v"), eps, v.indices))
        .collect()(0).getSeq[Long](0)
      v.zipWithIndex.foreach { case (x, i) =>
        assert(cells(i) == math.floor(x.toDouble / eps).toLong)
      }
    }
  }

  test("TopKByScoreLong ranks exact longs beyond double's 2^53 range") {
    // 2^53 and 2^53 + 1 are the SAME double (9007199254740992.0) — the
    // double-scored heap would tie them and fall to the id tie-break,
    // keeping id 1 (the WRONG row). The long heap must keep id 2.
    val big = 1L << 53
    val rows = Seq((0L, 1L, big + 1), (0L, 2L, big))
    val df = spark.createDataFrame(rows).toDF("g", "id", "score")
    val got = df.groupBy("g")
      .agg(graft.functions.TopKByScore.topkMinLong(
        col("id"), col("score"), 1).as("t"))
      .select(explode(col("t")).as("p"))
      .select(col("p.id"), col("p.score")).collect()(0)
    assert(got.getLong(0) == 2L && got.getLong(1) == big)
    // and the double heap demonstrably CANNOT make this distinction
    val dbl = df.groupBy("g")
      .agg(graft.functions.TopKByScore.topkMin(
        col("id"), col("score").cast("double"), 1).as("t"))
      .select(explode(col("t")).as("p"))
      .select(col("p.id")).collect()(0).getLong(0)
    assert(dbl == 1L, "double heap expected to collapse the tie to id 1")
  }

  test("TopKByScoreLong == window top-k across partitions (ties by id)") {
    val rnd = new Random(7)
    val rows = (0 until 4000).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(9000).toLong,
        rnd.nextLong() % 1000000L))
    val df = spark.createDataFrame(rows).toDF("g", "id", "score")
      .repartition(11).persist()
    val agg = df.groupBy("g")
      .agg(graft.functions.TopKByScore.topkMinLong(
        col("id"), col("score"), 5).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("pos", "p")))
      .select(col("g"), col("p.id").as("id"), (col("pos") + 1).as("rnk"))
      .collect().map(r => (r.getLong(0), r.getInt(2).toLong) -> r.getLong(1))
      .toMap
    val win = df.withColumn("rnk", org.apache.spark.sql.functions.row_number()
        .over(org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(col("score"), col("id"))))
      .filter(col("rnk") <= 5)
      .collect().map(r => (r.getLong(0), r.getInt(3).toLong) -> r.getLong(1))
      .toMap
    assert(agg == win)
    df.unpersist()
  }
}
