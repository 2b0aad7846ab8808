package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  /** Multiset of rows (joins can legitimately duplicate tuples). */
  private def bag(df: DataFrame): Map[String, Int] =
    df.collect().map(_.toSeq.mkString("|")).groupBy(identity)
      .view.mapValues(_.length).toMap

  // 80% of probe rows hit key 1; some keys have NO dimension match, the
  // dimension has duplicate keys (2 rows for key 7), and some probe keys
  // are NULL — all the inner-join edge semantics in one fixture
  private def fixtures: (DataFrame, DataFrame) = {
    val big = spark.range(0, 5000)
      .select(
        when(col("id") % 5 < 4, lit(1L))
          .otherwise(pmod(col("id"), lit(100)) + 2)
          .as("k"),
        col("id").as("v"))
      .union(spark.range(0, 10)
        .select(lit(null).cast("long").as("k"), col("id").as("v")))
    val small = spark.range(1, 91)
      .select(col("id").as("sk"), concat(lit("d"), col("id")).as("dim"))
      .union(spark.range(7, 8)
        .select(col("id").as("sk"), lit("d7bis").as("dim")))
    (big, small)
  }

  test("saltedInner == plain inner join, for every salt factor") {
    val (big, small) = fixtures
    val plain = bag(big.join(small, col("k") === col("sk")))
    for (f <- Seq(1, 8)) {
      val salted = bag(SkewJoin.saltedInner(big, small, "k", "sk", f))
      assert(salted == plain, s"saltFactor=$f diverged from the plain join")
    }
  }

  test("both sides naming the key identically still joins (no ambiguity)") {
    val (big, small) = fixtures
    val small2 = small.withColumnRenamed("sk", "k") // the common join shape
    val plain = bag(big.as("l").join(small2.as("r"),
      col("l.k") === col("r.k")))
    val salted = bag(SkewJoin.saltedInner(big, small2, "k", "k", 4))
    assert(salted == plain)
  }

  test("salted plan shuffles on (key, salt) — no broadcast rescue, no sort") {
    val (big, small) = fixtures
    val plan = SkewJoin.saltedInner(big, small, "k", "sk", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), plan.take(600))
    assert(!plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(plan.contains("_salt_l"), "join key must include the salt")
  }

  test("a hot key's probe rows actually spread across salt values") {
    val (big, _) = fixtures
    // reproduce the op's salt expression on the hot key's rows: every
    // salt value in [0, 8) should receive a non-trivial share
    val salts = big.filter(col("k") === 1L)
      .withColumn("_salt_l",
        pmod(xxhash64(col("k"), col("v"), lit(8)), lit(8)).cast("int"))
      .groupBy("_salt_l").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(salts.keySet == (0 until 8).toSet, salts.toString)
    val (mn, mx) = (salts.values.min, salts.values.max)
    assert(mx < 2L * mn, s"content hash should spread evenly, got $salts")
  }

  test("guards: salt column collision and bad factor are rejected") {
    val (big, small) = fixtures
    assertThrows[IllegalArgumentException] {
      SkewJoin.saltedInner(big.withColumn("_SALT_L", lit(1)), small,
        "k", "sk", 4)
    }
    assertThrows[IllegalArgumentException] {
      SkewJoin.saltedInner(big, small, "k", "sk", 0)
    }
  }
}
