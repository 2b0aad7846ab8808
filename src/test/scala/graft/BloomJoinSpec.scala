package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {

  import spark.implicits._

  test("pruned join == plain join (fp-prone tiny bloom included)") {
    val probe = (1L to 2000L).map(i => (i % 500, s"p$i")).toDF("k", "pv")
    val build = (1L to 50L).map(i => (i * 7, s"b$i")).toDF("k", "bv")
    val plain = probe.join(build, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    for (fpp <- Seq(0.5, 0.03)) { // a half-FPP bloom still yields exact rows
      val got = BloomJoin.innerPruned(probe, build, "k", 1000L, fpp)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got == plain, s"diverged at fpp=$fpp")
    }
  }

  test("bloom predicate keeps every build key (no false negatives)") {
    val build = (1L to 300L).map(i => Tuple1(i * 13)).toDF("k")
    val probe = (1L to 300L).map(i => Tuple1(i * 13)).toDF("k")
    val kept = probe.filter(
      BloomJoin.mightContainKey(build, "k", col("k"), 300L, 0.01)).count()
    assert(kept == 300L)
  }

  test("selectivity: a tight bloom prunes most non-matching probe rows") {
    val build = (1L to 20L).map(i => Tuple1(i)).toDF("k")
    val probe = (1L to 100000L).map(i => Tuple1(i)).toDF("k")
    val kept = probe.filter(
      BloomJoin.mightContainKey(build, "k", col("k"), 100L, 0.01)).count()
    // 20 true + ~1% of 99,980 false positives; generous ceiling
    assert(kept >= 20L && kept < 5000L, s"kept=$kept")
  }

  test("string keys work through the same hash path") {
    val probe = Seq("a", "b", "c", "d").toDF("k")
    val build = Seq("b", "d", "zz").toDF("k")
    val got = BloomJoin.innerPruned(probe, build, "k", 10L, 0.01)
      .select("k").as[String].collect().toSet
    assert(got == Set("b", "d"))
  }
}
