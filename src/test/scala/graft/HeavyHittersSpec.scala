package graft

import graft.operators.HeavyHitters
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  private def brute(vals: Seq[String], k: Int): Map[String, Long] = {
    val n = vals.size.toLong
    vals.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap
  }

  private def run(vals: Seq[String], k: Int, parts: Int): Map[String, Long] =
    HeavyHitters.exactOverThreshold(
      vals.toDF("item").repartition(parts), "item", k)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("zipfian stream: exact counts, partitioning-independent") {
    val rnd = new scala.util.Random(5)
    // zipf-ish: value i drawn with weight ~ 1/(i+1)
    val pool = (0 until 200).flatMap(i => Seq.fill(200 / (i + 1) + 1)(s"v$i"))
    val vals = Seq.fill(20000)(pool(rnd.nextInt(pool.size)))
    val want = brute(vals, 50)
    assert(want.nonEmpty, "fixture should have heavy hitters")
    for (parts <- Seq(1, 3, 16))
      assert(run(vals, 50, parts) == want, s"diverged at parts=$parts")
  }

  test("threshold boundary: count*k == n is NOT a heavy hitter") {
    // n=8, k=4: 'a' has count 2 → 2*4 == 8, strictly-greater fails
    val vals = Seq("a", "a", "b", "c", "d", "e", "f", "g")
    assert(run(vals, 4, 2) == Map.empty)
    // 'a' with 3 of 9: 3*4 > 9 → in
    val vals2 = vals :+ "a"
    assert(run(vals2, 4, 2) == Map("a" -> 3L))
  }

  test("nulls ignored; n excludes them") {
    val df = Seq(Some("a"), Some("a"), Some("b"), None, None, None)
      .toDF("item")
    val got = HeavyHitters.exactOverThreshold(df, "item", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n=3 non-null; a:2 → 2*2 > 3 in; b:1 → 2 > 3 out
    assert(got == Map("a" -> 2L))
  }
}
