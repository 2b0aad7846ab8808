package graft

import graft.operators.ShortestPath
import org.apache.spark.sql.functions._

class ShortestPathSpec extends SparkSpec {

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHops: Int, localThreshold: Long): Map[Long, Int] =
    ShortestPath.hops(
      spark.createDataFrame(edges).toDF("src", "dst").repartition(5),
      "src", "dst",
      spark.createDataFrame(seeds.map(Tuple1(_))).toDF("id"), "id",
      maxHops, localThreshold)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  // 1 → 2 → 3 → 4 → 5, a side branch 2 → 6, a cycle 4 → 1,
  // and a disconnected component 10 → 11
  private val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (2L, 6L), (4L, 1L), (10L, 11L))
  private val expect = Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4,
    6L -> 2)

  test("BFS levels: cycle re-entry ignored, unreachable absent (fused)") {
    assert(run(chain, Seq(1L), 10, localThreshold = 100) == expect)
  }

  test("distributed loop produces identical levels") {
    assert(run(chain, Seq(1L), 10, localThreshold = 0) == expect)
  }

  test("maxHops truncates exploration identically on both paths") {
    val cut = expect.filter(_._2 <= 2)
    assert(run(chain, Seq(1L), 2, localThreshold = 100) == cut)
    assert(run(chain, Seq(1L), 2, localThreshold = 0) == cut)
  }

  test("multi-source takes the minimum; isolated seed appears at hop 0") {
    val got = run(chain, Seq(1L, 4L, 99L), 10, localThreshold = 100)
    // 4 is a seed: 5 is now 1 hop, 1 is 1 hop (via the 4→1 cycle edge)
    assert(got == Map(1L -> 0, 4L -> 0, 99L -> 0, 2L -> 1, 5L -> 1,
      3L -> 2, 6L -> 2))
    assert(run(chain, Seq(1L, 4L, 99L), 10, localThreshold = 0) == got)
  }

  private def runW(edges: Seq[(Long, Long, Long)], seeds: Seq[Long],
      rounds: Int, localThreshold: Long): Map[Long, Long] =
    ShortestPath.weighted(
      spark.createDataFrame(edges).toDF("src", "dst", "w").repartition(5),
      "src", "dst", "w",
      spark.createDataFrame(seeds.map(Tuple1(_))).toDF("id"), "id",
      rounds, localThreshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("weighted: cheaper long path beats direct edge; parallel edges collapse") {
    val edges = Seq(
      (1L, 2L, 10L), (1L, 2L, 7L), // parallel — min wins
      (2L, 3L, 1L),
      (1L, 3L, 100L),              // direct but expensive
      (3L, 4L, 1L), (9L, 1L, 1L))  // 9 unreachable from seed 1
    val expect = Map(1L -> 0L, 2L -> 7L, 3L -> 8L, 4L -> 9L)
    assert(runW(edges, Seq(1L), 4, localThreshold = 100) == expect)
    assert(runW(edges, Seq(1L), 4, localThreshold = 0) == expect)
  }

  test("weighted: round budget bounds path length (Jacobi, not Gauss-Seidel)") {
    val chain = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    val got = runW(chain, Seq(1L), 2, localThreshold = 100)
    // 4 is 3 edges away — invisible at rounds=2 on BOTH paths
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    assert(runW(chain, Seq(1L), 2, localThreshold = 0) == got)
  }

  test("weighted random graph: both paths equal sequential Bellman-Ford") {
    val rnd = new scala.util.Random(23)
    val edges = (1 to 400).map(_ => (rnd.nextInt(80).toLong,
      rnd.nextInt(80).toLong, (rnd.nextInt(100) + 1).toLong))
    val seeds = Seq(0L, 40L)
    val rounds = 5
    // sequential Jacobi Bellman-Ford over min-collapsed parallel edges
    val e = edges.groupBy(t => (t._1, t._2))
      .map { case ((s, d), v) => (s, d, v.map(_._3).min) }.toSeq
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val relaxed = e.flatMap { case (s, d, w) =>
        dist.get(s).map(ds => d -> (ds + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).min }
    }
    assert(runW(edges, seeds, rounds, localThreshold = 10000) == dist)
    assert(runW(edges, seeds, rounds, localThreshold = 0) == dist)
  }

  test("random graph: both paths agree with sequential BFS") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 600).map(_ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    val seeds = Seq(0L, 60L)
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var level = Map(seeds.map(_ -> 0): _*)
    var frontier = seeds
    var d = 0
    while (frontier.nonEmpty && d < 20) {
      d += 1
      val next = frontier.flatMap(v => adj.getOrElse(v, Nil))
        .distinct.filterNot(level.contains)
      next.foreach(v => level += v -> d)
      frontier = next
    }
    assert(run(edges, seeds, 20, localThreshold = 10000) == level)
    assert(run(edges, seeds, 20, localThreshold = 0) == level)
  }
}
