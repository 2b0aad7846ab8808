package graft

import graft.operators.TriangleCount
import org.apache.spark.sql.functions._

class TriangleCountSpec extends SparkSpec {

  /** Brute-force reference: count triangles per node over canonical
    * undirected edges. */
  private def refCounts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val ce = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b))
    }.distinct
    val eset = ce.toSet
    val nodes = ce.flatMap(p => Seq(p._1, p._2)).distinct
    val counts = scala.collection.mutable.Map(nodes.map(_ -> 0L): _*)
    val sorted = nodes.sorted
    for {
      i <- sorted.indices; j <- (i + 1) until sorted.size
      if eset((sorted(i), sorted(j)))
      k <- (j + 1) until sorted.size
      if eset((sorted(j), sorted(k))) && eset((sorted(i), sorted(k)))
    } {
      counts(sorted(i)) += 1; counts(sorted(j)) += 1; counts(sorted(k)) += 1
    }
    counts.toMap
  }

  private def run(edges: Seq[(Long, Long)],
      localThreshold: Long = 5_000_000L): Map[Long, Long] =
    TriangleCount.perNode(
      spark.createDataFrame(edges).toDF("s", "t"), "s", "t", localThreshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand graph: two triangles sharing an edge, plus a pendant") {
    // triangle 1-2-3, triangle 2-3-4, pendant 5 off node 1
    val e = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 2L -> 4L, 4L -> 3L, 1L -> 5L)
    val got = run(e)
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("random graphs match brute force; orientation/dup/self-loop safe") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 3).map { _ =>
      Seq.fill(160)((rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
    }
    edges.foreach { e =>
      // feed BOTH orientations + duplicates + self-loops
      val messy = e ++ e.map(_.swap) ++ e.take(5).map(p => (p._1, p._1))
      assert(run(messy) == refCounts(e), s"diverged on $e")
    }
  }

  test("fused and distributed paths are bit-identical") {
    val rnd = new scala.util.Random(13)
    val e = Seq.fill(400)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val fused = run(e)                      // default threshold → fused
    val dist = run(e, localThreshold = 0L)  // forced distributed pipeline
    assert(fused == dist)
    assert(fused == refCounts(e.filter(p => p._1 != p._2)))
  }

  test("hub skew: star plus one rim edge — hub builds almost no wedges") {
    // star center 0 with 40 rim nodes; one rim edge (1,2) closes ONE
    // triangle; every node in it reports 1, the rest 0
    val star = (1L to 40L).map(0L -> _)
    val got = run(star :+ (1L -> 2L))
    assert(got(0L) == 1L && got(1L) == 1L && got(2L) == 1L)
    assert((3L to 40L).forall(got(_) == 0L))
  }
}
