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
