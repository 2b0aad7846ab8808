package graft

import graft.operators.KCore
import org.apache.spark.sql.DataFrame

class KCoreSpec extends SparkSpec {

  private def edgeDf(es: Seq[(Long, Long)], parts: Int = 4): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(es, parts)).toDF("s", "d")

  // K4 on {1,2,3,4} + a tail 4-5-6 + an isolated edge 7-8
  private val graph = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L), (7L, 8L))

  private def collect(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("3-core peels the tail and keeps the clique") {
    val got = collect(KCore.run(edgeDf(graph), "s", "d", 3, rounds = 5))
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("1-core keeps everything, high k empties") {
    val all = collect(KCore.run(edgeDf(graph), "s", "d", 1, rounds = 3))
    assert(all.keySet == (1L to 8L).toSet)
    assert(KCore.run(edgeDf(graph), "s", "d", 4, rounds = 5).count() == 0)
  }

  test("fused == distributed, including mid-peel round budgets") {
    for (r <- Seq(1, 2, 6)) {
      val fused = collect(KCore.run(edgeDf(graph), "s", "d", 2, rounds = r))
      val dist = collect(KCore.run(edgeDf(graph), "s", "d", 2, rounds = r,
        localThreshold = 0L))
      assert(fused == dist, s"rounds=$r")
    }
  }

  test("duplicate/reversed/self-loop edges collapse") {
    val noisy = graph ++ Seq((2L, 1L), (1L, 1L), (3L, 2L), (1L, 2L))
    val got = collect(KCore.run(edgeDf(noisy), "s", "d", 3, rounds = 5))
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("fixpoint: extra rounds are a no-op (q95's round budget is enough)") {
    val r5 = collect(KCore.run(edgeDf(graph), "s", "d", 2, rounds = 5))
    val r9 = collect(KCore.run(edgeDf(graph), "s", "d", 2, rounds = 9))
    assert(r5 == r9)
  }

  test("partition-count invariance (distributed path)") {
    val a = collect(KCore.run(edgeDf(graph, 1), "s", "d", 3, rounds = 4,
      localThreshold = 0L))
    val b = collect(KCore.run(edgeDf(graph, 7), "s", "d", 3, rounds = 4,
      localThreshold = 0L))
    assert(a == b)
  }
}
